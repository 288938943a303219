"""Optimizers and LR schedules for the three training stages.

Parity targets:
  * stage-1 intra-video: constant-LR Adam 3e-4, no weight decay
    (`seg18/train_swin.py:122`, `seg18/exp.sh:3-4`);
  * stage-2 pretraining: LARS (trust coef 1e-3) with weight decay 1e-5
    folded into the gradient and BN/bias (ndim<=1) parameters excluded from
    decay AND trust scaling (`pixcontrast_18/contrast/lars.py:7-31,33-152`),
    base LR linearly scaled by batch*world/256
    (`main_pretrain_swinv5.py:38-45`), per-iteration warmup->cosine schedule
    (`contrast/lr_scheduler.py:6-85`);
  * stage-3 fine-tune: SGD momentum 0.9, wd 1e-4, poly(0.9) schedule stepped
    per iteration (`train_CL_ft_mswin_sgd_minput.py:162-165`,
    `seg18/utils/lr_scheduler.py:46-67`). Note: the reference builds a x10
    classifier param group (`train_CL_ft_mswin_sgd_minput.py:147-159`) but
    its `LR_Scheduler_Head._adjust_learning_rate` overwrites every group
    with the same LR each iteration (`lr_scheduler.py:75-83`), so the
    effective schedule is uniform. `make_sgd(head_lr_mult=...)` implements
    both: the default 1.0 reproduces the reference's effective (uniform)
    behavior; 10.0 activates the intended classifier boost.

All schedules are optax-style step->lr callables (pure, jit-friendly).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import optax


def scale_lr_linear(base_lr: float, batch_size: int, world_size: int = 1,
                    denom: int = 256) -> float:
    """Linear LR scaling rule (`main_pretrain_swinv5.py:38,45`)."""
    return base_lr * batch_size * world_size / denom


def warmup_cosine_schedule(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    warmup_multiplier: float = 100.0,
    eta_min: float = 1e-6,
) -> Callable:
    """GradualWarmupScheduler(CosineAnnealingLR) semantics
    (`contrast/lr_scheduler.py:25-39,65-85`): LR starts at base/multiplier,
    reaches base at `warmup_steps`, then cosine-anneals to `eta_min` over
    the remaining steps."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr / warmup_multiplier * (
            (warmup_multiplier - 1.0) * step / max(warmup_steps, 1) + 1.0)
        t = jnp.maximum(step - warmup_steps, 0.0)
        t_max = max(total_steps - warmup_steps, 1)
        cos = eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t / t_max))
        return jnp.where(step <= warmup_steps, warm, cos)

    return schedule


def poly_schedule(base_lr: float, total_steps: int, power: float = 0.9,
                  warmup_steps: int = 0) -> Callable:
    """`lr = base * (1 - T/total)^power` with optional linear warmup
    (`seg18/utils/lr_scheduler.py:46-56`)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / max(warmup_steps, 1)
        t = jnp.maximum(step - warmup_steps, 0.0)
        denom = max(total_steps - warmup_steps, 1)
        frac = jnp.clip(1.0 - t / denom, 0.0, 1.0)
        main = base_lr * jnp.power(frac, power)
        if warmup_steps > 0:
            return jnp.where(step < warmup_steps, warm, main)
        return main

    return schedule


def step_schedule(base_lr: float, steps_per_epoch: int,
                  lr_step: int) -> Callable:
    """`lr = base * 0.1^(epoch // lr_step)` (`lr_scheduler.py:57-58`)."""

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) // steps_per_epoch
        return base_lr * jnp.power(0.1, epoch // lr_step)

    return schedule


def _no_decay_mask(params):
    """Exclude ndim<=1 leaves (BN/LN scales+biases, conv/dense biases) from
    weight decay and LARS trust scaling — the reference's `add_weight_decay`
    grouping heuristic (`contrast/lars.py:7-31`)."""
    import jax

    return jax.tree.map(lambda p: p.ndim > 1, params)


def make_adam(lr) -> optax.GradientTransformation:
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


def _subtree_mask(key: str):
    """params -> same-structure bool tree, True under top-level `key`."""
    import jax

    def mask(params):
        return {k: jax.tree.map(lambda _: k == key, v)
                for k, v in params.items()}

    return mask


def make_sgd(lr, momentum: float = 0.9, weight_decay: float = 1e-4,
             head_lr_mult: float = 1.0,
             head_key: str = "classifier") -> optax.GradientTransformation:
    """torch-SGD parity: decay folded into the gradient before the momentum
    buffer update. `head_lr_mult` scales the classifier subtree's updates
    (the reference's intended x10 head group,
    `train_CL_ft_mswin_sgd_minput.py:147-159`); the default 1.0 matches the
    reference's effective behavior (its scheduler overwrites the group LRs
    uniformly)."""
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr, momentum=momentum, nesterov=False),
    )
    if head_lr_mult == 1.0:
        return tx
    return optax.chain(
        tx, optax.masked(optax.scale(head_lr_mult), _subtree_mask(head_key)))


def make_lars(lr, weight_decay: float = 1e-5,
              trust_coefficient: float = 1e-3,
              momentum: float = 0.9) -> optax.GradientTransformation:
    """LARS with the reference's exclusion rules."""
    return optax.lars(
        lr,
        weight_decay=weight_decay,
        weight_decay_mask=_no_decay_mask,
        trust_coefficient=trust_coefficient,
        trust_ratio_mask=_no_decay_mask,
        momentum=momentum,
    )
