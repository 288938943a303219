"""Contrastive encoder + projection head for inter-video pretraining.

Capability parity with the reference `PixPro` dual-encoder
(`/root/reference/pixcontrast_18/contrast/models/PixPro_swin_v5.py:140-561`):
query and key encoders are the TswinPlus trunk (resnet+swin+aspp+projections)
followed by a 1x1-conv MLP projector (400 -> 512 -> 256) and L2
normalization.

The reference implements the dual encoder as ONE nn.Module holding two full
copies of every submodule, with the 6-clip key forward pasted six times and
EMA updates as in-place parameter loops. JAX separates parameters from
code, so here there is a single `ContrastEncoder` module; the training step
(`stswincl_tpu/train/train_contrast.py`) holds two param pytrees (query +
key), applies the same module under `stop_gradient` for keys, scans the key
pass over the 6 clips (`lax.scan`, so BN stats thread through in reference
order), and does the cosine-ramped EMA as one `tree_map` —
the momentum schedule `1-(1-m)*(cos(pi*k/K)+1)/2` matches
`PixPro_swin_v5.py:258-263`.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from stswincl_tpu.models.norm import BN_MOMENTUM, BN_EPSILON

from stswincl_tpu.models.stswin import TswinPlus
from stswincl_tpu.models.init import torch_conv_kernel_init, torch_bias_init

Dtype = Any


class MLP2d(nn.Module):
    """1x1-conv MLP with BN+ReLU in the middle (`PixPro_swin_v5.py:29-46`)."""

    inner_dim: int = 512
    out_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.inner_dim, (1, 1), use_bias=True,
                    kernel_init=torch_conv_kernel_init,
                    bias_init=torch_bias_init(x.shape[-1]),
                    dtype=self.dtype, name="linear1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPSILON,
                         dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x.astype(self.dtype))
        x = nn.Conv(self.out_dim, (1, 1), use_bias=True,
                    kernel_init=torch_conv_kernel_init,
                    bias_init=torch_bias_init(x.shape[-1]),
                    dtype=self.dtype, name="linear2")(x)
        return x


def ProjHead(dtype=jnp.float32, name="projector"):
    """Proj_Head: MLP2d(400 -> 512 -> 256) (`PixPro_swin_v5.py:131-132`)."""
    return MLP2d(inner_dim=512, out_dim=256, dtype=dtype, name=name)


def PredHead(dtype=jnp.float32, name="predictor"):
    """Pred_Head: MLP2d(256 -> 4096 -> 256) (`PixPro_swin_v5.py:134-135`)."""
    return MLP2d(inner_dim=4096, out_dim=256, dtype=dtype, name=name)


class ContrastEncoder(nn.Module):
    """TswinPlus trunk + projector + L2 norm: clip -> (B, h8, w8, 256).

    One set of weights; the train step maintains query/key copies.
    `num_classes` only sizes the (unused during pretraining) classifier so
    checkpoints translate losslessly between stages.

    `with_instance=True` adds the reference's instance-level branch
    (`PixPro_swin_v5.py:243-256`, gated there by
    `--pixpro-ins-loss-weight`, 0 in every shipped launcher): a global
    average pool of the 400-ch feature map (the reference's
    `AvgPool2d(7, stride=1)` assumes the upstream PixPro's 7x7 map, i.e. a
    global pool), an instance projector (Proj_Head clone) and a Pred_Head
    predictor on the query side. Returns (pixel_proj, ins_proj, ins_pred):
    the key branch consumes ins_proj (its predictor params are unused, as
    the reference's key branch has none), the query branch ins_pred.
    """

    num_classes: int
    swin_dim: int = 512
    num_heads: int = 4
    with_instance: bool = False
    swin_depths: tuple = (3, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        segmentor = TswinPlus(self.num_classes, swin_dim=self.swin_dim,
                              num_heads=self.num_heads,
                              swin_depths=self.swin_depths, dtype=self.dtype,
                              name="segmentor")
        features = segmentor(x, train=train, return_features=True)
        proj = ProjHead(dtype=self.dtype, name="projector")(features, train)
        proj = proj.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(proj * proj, axis=-1, keepdims=True))
        # F.normalize semantics: eps guards the zero vector
        pix = proj / jnp.maximum(norm, 1e-12)
        if not self.with_instance:
            return pix

        pooled = jnp.mean(features, axis=(1, 2), keepdims=True)  # (B,1,1,400)
        ins_proj = ProjHead(dtype=self.dtype, name="projector_instance")(
            pooled, train)
        ins_pred = PredHead(dtype=self.dtype, name="predictor")(
            ins_proj, train)
        return pix, ins_proj[:, 0, 0].astype(jnp.float32), \
            ins_pred[:, 0, 0].astype(jnp.float32)
