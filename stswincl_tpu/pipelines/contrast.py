"""Stage-2 inter-video contrastive pretraining driver.

End-to-end parity with `pixcontrast_18/main_pretrain_swinv5.py:106-196`:
warm start both encoder branches from a stage-1 seg checkpoint
(`PixPro_swin_v5.py:162-183` / `load_model_full`), LARS with linearly scaled
LR + warmup-cosine schedule stepped per iteration, epoch loop with periodic
full-state checkpoints and `--auto-resume` pickup of the latest checkpoint.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from stswincl_tpu.configs import ContrastTrainConfig
from stswincl_tpu.models import ContrastEncoder
from stswincl_tpu.train import (
    ContrastTrainState,
    make_contrast_train_step,
    make_lars,
    warmup_cosine_schedule,
    scale_lr_linear,
)
from stswincl_tpu.ckpt import (
    save_checkpoint,
    load_checkpoint,
    latest_step,
    translate_seg_to_pretrain,
)
from stswincl_tpu.parallel import make_mesh, shard_batch, replicate
from stswincl_tpu.pipelines.common import (
    build_contrast_dataset,
    build_loader,
    resolve_dtype,
)
from stswincl_tpu.data.cadis import CADIS_CLASS_NUM
from stswincl_tpu.utils import MetricLogger, setup_logger


def run_contrast_pretraining(cfg: ContrastTrainConfig):
    logger = setup_logger(cfg.log_dir)
    metrics_log = MetricLogger(cfg.log_dir)
    from stswincl_tpu.pipelines.seg import _dump_config
    _dump_config(cfg)
    mesh = make_mesh()

    class_num = (CADIS_CLASS_NUM[cfg.data.tag]
                 if cfg.data.dataset == "cadis" else cfg.data.num_classes)
    model = ContrastEncoder(num_classes=class_num,
                            swin_dim=cfg.model.swin_dim,
                            swin_depths=tuple(cfg.model.swin_depths),
                            num_heads=cfg.model.num_heads,
                            with_instance=cfg.pixpro_ins_loss_weight > 0,
                            dtype=resolve_dtype(cfg.model.dtype))

    dataset = build_contrast_dataset(cfg.data)
    loader = build_loader(dataset, cfg.data, shuffle=True)
    steps_per_epoch = loader.steps_per_epoch()
    total_steps = cfg.num_epochs * steps_per_epoch

    h, w = cfg.data.crop_hw
    import jax.numpy as jnp
    x = jnp.zeros((1, cfg.data.t, h, w, 3), jnp.float32)
    variables = model.init(jax.random.key(cfg.data.seed), x, train=False)

    # warm start encoder subtrees from the stage-1 seg checkpoint
    if cfg.init_checkpoint:
        seg = load_checkpoint(cfg.init_checkpoint)
        params, skipped = translate_seg_to_pretrain(
            seg["params"], variables["params"])
        stats, _ = translate_seg_to_pretrain(
            seg.get("batch_stats", {}), variables["batch_stats"])
        variables = {"params": params, "batch_stats": stats}
        logger.info("warm start from %s (%d leaves kept init)",
                    cfg.init_checkpoint, len(skipped))

    lr = scale_lr_linear(cfg.base_lr, cfg.data.batch_size,
                         jax.process_count())
    schedule = warmup_cosine_schedule(
        lr, cfg.warmup_epochs * steps_per_epoch, total_steps,
        warmup_multiplier=cfg.warmup_multiplier)
    tx = make_lars(schedule, weight_decay=cfg.weight_decay,
                   trust_coefficient=cfg.lars_trust_coef)

    state = ContrastTrainState.create(variables, tx)
    start_epoch = 0
    if cfg.resume and latest_step(cfg.ckpt_dir) is not None:
        state = load_checkpoint(cfg.ckpt_dir, target=state)
        start_epoch = int(state.step) // max(steps_per_epoch, 1)
        logger.info("auto-resumed at epoch %d", start_epoch)
    state = replicate(state, mesh)

    train_step = make_contrast_train_step(
        model, tx, class_num=class_num, total_steps=total_steps,
        base_momentum=cfg.momentum,
        ins_loss_weight=cfg.pixpro_ins_loss_weight)

    for epoch in range(start_epoch, cfg.num_epochs):
        t0 = time.time()
        losses = []
        for batch in loader.epoch(epoch):
            sb = shard_batch(
                {"clips": batch["clips"], "labels": batch["labels"]}, mesh)
            state, m = train_step(state, sb["clips"], sb["labels"])
            losses.append(m["loss"])
        loss = float(np.mean([float(l) for l in losses])) if losses else 0.0
        logger.info("epoch %d: loss %.4f (%.1fs)", epoch, loss,
                    time.time() - t0)
        metrics_log.log(int(state.step),
                        {"pretrain/loss": loss,
                         "pretrain/momentum": float(m["momentum"])})
        if (epoch + 1) % cfg.save_every_epochs == 0 or epoch == cfg.num_epochs - 1:
            save_checkpoint(cfg.ckpt_dir, int(state.step),
                            jax.device_get(state))
    metrics_log.close()
    return state
