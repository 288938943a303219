"""Shared pipeline plumbing: model/data/mesh construction from configs."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stswincl_tpu.configs import DataConfig, ModelConfig
from stswincl_tpu.models import TswinPlus, DeepLabV3Plus, ContrastEncoder
from stswincl_tpu.data import (
    EndovisDataset,
    CadisDataset,
    ContrastiveClipDataset,
    Loader,
    SyntheticSegDataset,
    SyntheticContrastDataset,
)
from stswincl_tpu.data.cadis import CADIS_CLASS_NUM
from stswincl_tpu.parallel import make_mesh


def resolve_dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def build_model(model_cfg: ModelConfig, data_cfg: DataConfig):
    num_classes = model_cfg.num_classes
    if data_cfg.dataset == "cadis":
        num_classes = CADIS_CLASS_NUM[data_cfg.tag]
    dtype = resolve_dtype(model_cfg.dtype)
    if model_cfg.arch == "puredeeplab18":
        # width tracks swin_dim so a scaled-down deeplab pre-stage produces
        # a resnet tree the matching swinPlus run can warm-start from
        return DeepLabV3Plus(num_classes=num_classes,
                             width=model_cfg.swin_dim // 8,
                             dtype=dtype), num_classes
    return TswinPlus(num_classes=num_classes, swin_dim=model_cfg.swin_dim,
                     swin_depths=tuple(model_cfg.swin_depths),
                     num_heads=model_cfg.num_heads,
                     attn_impl=model_cfg.attn_impl,
                     gelu_exact=model_cfg.gelu_exact, remat=model_cfg.remat,
                     dtype=dtype), num_classes


def build_seg_dataset(cfg: DataConfig, split: str):
    if cfg.dataset == "synthetic":
        return SyntheticSegDataset(
            length=64 if split == "train" else 8, t=cfg.t,
            hw=cfg.crop_hw, num_classes=cfg.num_classes)
    if cfg.dataset == "cadis":
        return CadisDataset(cfg.root, split, tag=cfg.tag, t=cfg.t,
                            step=cfg.step, crop_hw=cfg.crop_hw,
                            base_hw=cfg.base_hw)
    return EndovisDataset(cfg.root, split, t=cfg.t, crop_hw=cfg.crop_hw,
                          base_hw=cfg.base_hw, num_classes=cfg.num_classes)


def build_contrast_dataset(cfg: DataConfig):
    if cfg.dataset == "synthetic":
        return SyntheticContrastDataset(length=32, t=cfg.t, hw=cfg.crop_hw,
                                        num_classes=cfg.num_classes)
    name = "cadis" if cfg.dataset == "cadis" else "endovis18"
    return ContrastiveClipDataset(cfg.root, name, tag=cfg.tag,
                                  crop_hw=cfg.crop_hw,
                                  rand_augment=cfg.rand_augment)


def build_loader(dataset, cfg: DataConfig, shuffle=True, batch_size=None):
    return Loader(
        dataset,
        batch_size=batch_size or cfg.batch_size,
        shuffle=shuffle,
        seed=cfg.seed,
        num_workers=cfg.num_workers,
        shard_index=jax.process_index(),
        num_shards=jax.process_count(),
    )


def init_model_variables(model, data_cfg: DataConfig, clip: bool = True):
    h, w = data_cfg.crop_hw
    if clip:
        x = jnp.zeros((1, data_cfg.t, h, w, 3), jnp.float32)
    else:
        x = jnp.zeros((1, h, w, 3), jnp.float32)
    return model.init(jax.random.key(data_cfg.seed), x, train=False)
