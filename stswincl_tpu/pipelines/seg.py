"""Stage-1 / stage-3 segmentation training driver.

End-to-end parity with `seg18/train_swin.py:67-272` /
`train_CL_ft_mswin_sgd_minput.py:80-309` (and the segcata twins): epoch loop
with per-iteration LR schedule, validation after every epoch, best-IoU +
latest checkpoints, early stop after `early_stop_epochs` stale epochs,
warm-start paths (reference `load_model` resnet-only and
`load_model_mswin_CL` pretrain translation), JSONL/TensorBoard metrics.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from stswincl_tpu.configs import SegTrainConfig
from stswincl_tpu.train import (
    SegTrainState,
    make_seg_train_step,
    make_seg_eval_step,
    make_adam,
    make_sgd,
    poly_schedule,
    step_schedule,
)
from stswincl_tpu.train.optim import warmup_cosine_schedule
from stswincl_tpu.ckpt import (
    save_checkpoint,
    load_checkpoint,
    latest_step,
    translate_pretrain_to_seg,
    import_tswinplus_state_dict,
    import_pixpro_state_dict,
)
from stswincl_tpu.parallel import make_mesh, shard_batch, replicate
from stswincl_tpu.pipelines.common import (
    build_model,
    build_seg_dataset,
    build_loader,
    init_model_variables,
)
from stswincl_tpu.pipelines.evaluate import evaluate_split
from stswincl_tpu.utils import MetricLogger, setup_logger


def _dump_config(cfg):
    """config.json dump at run start (`main_pretrain_swinv5.py:251-255`)."""
    import os
    from stswincl_tpu.configs import to_json
    from stswincl_tpu.utils.logging import is_main_process

    if is_main_process():
        os.makedirs(cfg.log_dir, exist_ok=True)
        with open(os.path.join(cfg.log_dir, "config.json"), "w") as f:
            f.write(to_json(cfg))


def _make_tx(cfg: SegTrainConfig, steps_per_epoch: int):
    if cfg.lr_scheduler == "constant":
        lr = cfg.lr
    elif cfg.lr_scheduler == "poly":
        lr = poly_schedule(cfg.lr, cfg.num_epochs * steps_per_epoch,
                           warmup_steps=cfg.warmup_epochs * steps_per_epoch)
    elif cfg.lr_scheduler == "cos":
        lr = warmup_cosine_schedule(
            cfg.lr, cfg.warmup_epochs * steps_per_epoch,
            cfg.num_epochs * steps_per_epoch, warmup_multiplier=1.0 + 1e-9,
            eta_min=0.0)
    elif cfg.lr_scheduler == "step":
        lr = step_schedule(cfg.lr, steps_per_epoch, lr_step=30)
    else:
        raise ValueError(cfg.lr_scheduler)
    if cfg.optimizer == "adam":
        return make_adam(lr)
    return make_sgd(lr, momentum=cfg.momentum, weight_decay=cfg.weight_decay,
                    head_lr_mult=cfg.head_lr_mult)


def _warm_start(cfg: SegTrainConfig, variables, logger):
    """Apply the configured warm-start path to fresh variables."""
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))

    if cfg.imagenet_checkpoint:
        # torchvision resnet18 ImageNet init for the backbone stem
        # (reference `resnet.py:98-102`)
        import torch
        from stswincl_tpu.ckpt import import_torchvision_resnet18
        sd = torch.load(cfg.imagenet_checkpoint, map_location="cpu",
                        weights_only=False)
        sd = {k: np.asarray(v) for k, v in sd.items()}
        rn_p, rn_s, um = import_torchvision_resnet18(sd)
        from stswincl_tpu.ckpt.checkpoint import _merge
        skipped = []
        params["resnet"] = _merge(params["resnet"], rn_p, ("resnet",), skipped)
        stats["resnet"] = _merge(stats["resnet"], rn_s, ("resnet",), skipped)
        logger.info("ImageNet resnet init: %d unmatched, %d skipped",
                    len(um), len(skipped))

    if cfg.torch_checkpoint:
        import torch
        raw = torch.load(cfg.torch_checkpoint, map_location="cpu",
                         weights_only=False)
        sd = raw.get("model", raw) if isinstance(raw, dict) else raw
        sd = {k: np.asarray(v) for k, v in sd.items()
              if hasattr(v, "numpy") or isinstance(v, np.ndarray)}
        if any(k.startswith(("pixpro.", "encoder_")) for k in sd):
            p, s, um = import_pixpro_state_dict(sd)
        else:
            p, s, um = import_tswinplus_state_dict(sd)
        params, skipped = translate_pretrain_to_seg({"segmentor": p}, params)
        stats, _ = translate_pretrain_to_seg({"segmentor": s}, stats)
        logger.info("torch warm start: %d unmatched keys, %d skipped leaves",
                    len(um), len(skipped))
    elif cfg.pretrain_checkpoint:
        # stage-2 -> stage-3 translation (load_model_mswin_CL semantics)
        enc = load_checkpoint(cfg.pretrain_checkpoint)
        enc_params = enc["params_q"] if "params_q" in enc else enc["params"]
        enc_stats = enc.get("stats_q", enc.get("batch_stats", {}))
        params, skipped = translate_pretrain_to_seg(enc_params, params)
        stats, _ = translate_pretrain_to_seg(enc_stats, stats)
        logger.info("pretrain warm start: %d leaves kept init", len(skipped))
    elif cfg.init_checkpoint:
        # Warm start from a previous seg run with the reference's tolerant
        # leaf merge (`seg18/utils/LoadModel.py:51-90`): leaves present in
        # both trees with matching shapes load; shape mismatches, keys
        # missing from the checkpoint, and checkpoint keys absent from the
        # model all fall back to the fresh init. This is what makes the
        # canonical cross-arch flow work — the DeepLabV3Plus pre-stage
        # warm-starting a swinPlus run (`seg18/exp.sh:3-8`,
        # examples/endovis18_full_pipeline.sh stage 1): the resnet subtree
        # transfers, the swin/projections/classifier keep init.
        from stswincl_tpu.ckpt.checkpoint import _merge
        prev = load_checkpoint(cfg.init_checkpoint)
        skipped: list = []
        params = _merge(params, prev.get("params", {}), (), skipped)
        stats = _merge(stats, prev.get("batch_stats", {}), (), skipped)
        logger.info("seg warm start from %s: %d leaves kept init/dropped",
                    cfg.init_checkpoint, len(skipped))

    return {"params": params, "batch_stats": stats}


def run_seg_training(cfg: SegTrainConfig):
    logger = setup_logger(cfg.log_dir)
    metrics_log = MetricLogger(cfg.log_dir)
    _dump_config(cfg)
    mesh = make_mesh()
    logger.info("devices: %s", jax.devices())

    model, num_classes = build_model(cfg.model, cfg.data)
    train_ds = build_seg_dataset(cfg.data, "train")
    val_split = "val" if cfg.data.dataset == "cadis" else "test"
    val_ds = build_seg_dataset(cfg.data, val_split)
    train_loader = build_loader(train_ds, cfg.data, shuffle=True)
    steps_per_epoch = train_loader.steps_per_epoch()

    variables = init_model_variables(model, cfg.data,
                                     clip=cfg.model.arch != "puredeeplab18")
    variables = _warm_start(cfg, variables, logger)

    tx = _make_tx(cfg, steps_per_epoch)
    state = SegTrainState.create(variables, tx)

    start_epoch = 0
    if cfg.resume and latest_step(cfg.ckpt_dir) is not None:
        state = load_checkpoint(cfg.ckpt_dir, target=state)
        start_epoch = int(state.step) // max(steps_per_epoch, 1)
        logger.info("resumed at epoch %d", start_epoch)

    state = replicate(state, mesh)
    ignore_index = (num_classes - 1 if cfg.data.dataset == "cadis" else -1)
    train_step = make_seg_train_step(
        model, tx, loss_type=cfg.loss, ohem_thresh=cfg.ohem_thresh,
        ignore_index=ignore_index)
    is_cadis = cfg.data.dataset == "cadis"
    eval_hw = cfg.eval_hw
    if is_cadis and tuple(eval_hw) == (1024, 1280):
        eval_hw = (540, 960)  # CaDIS scoring resolution (cata_test.py)
    eval_step = make_seg_eval_step(model, out_hw=eval_hw,
                                   align_corners=not is_cadis)

    best_iou, best_epoch = 0.0, 0
    for epoch in range(start_epoch, cfg.num_epochs):
        t0 = time.time()
        losses = []
        for batch in train_loader.epoch(epoch):
            sb = shard_batch(
                {"image": batch["image"], "label": batch["label"]}, mesh)
            state, m = train_step(state, sb["image"], sb["label"])
            losses.append(m["loss"])
        loss = float(np.mean([float(l) for l in losses])) if losses else 0.0
        logger.info("epoch %d: loss %.4f (%.1fs)", epoch, loss, time.time() - t0)
        metrics_log.log(int(state.step), {"train/loss": loss})

        if (epoch + 1) % cfg.eval_every == 0:
            summary = evaluate_split(model, state.params, state.batch_stats,
                                     val_ds, cfg, eval_step=eval_step)
            iou = summary.get("iou", summary.get("miou", 0.0))
            metrics_log.log(int(state.step),
                            {f"val/{k}": v for k, v in summary.items()
                             if isinstance(v, (int, float))})
            logger.info("epoch %d: val %s", epoch,
                        {k: round(v, 4) for k, v in summary.items()
                         if isinstance(v, (int, float))})
            save_checkpoint(cfg.ckpt_dir, int(state.step), jax.device_get(state))
            if iou > best_iou:
                best_iou, best_epoch = iou, epoch
                save_checkpoint(os.path.join(cfg.ckpt_dir, "best"),
                                int(state.step), jax.device_get(state))
            elif epoch - best_epoch >= cfg.early_stop_epochs:
                logger.info("early stop at epoch %d (best %.4f @ %d)",
                            epoch, best_iou, best_epoch)
                break
    metrics_log.close()
    return best_iou
