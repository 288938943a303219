"""Inter-video pixel-contrastive pretraining (stage 2).

Capability parity with `pixcontrast_18/main_pretrain_swinv5.py` +
`PixPro_swin_v5.py:140-597`, restructured for JAX:

  * ONE `ContrastEncoder` module; query and key branches are two parameter
    pytrees in the train state;
  * cosine-ramped EMA momentum `1-(1-m)*(cos(pi*k/K)+1)/2`
    (`PixPro_swin_v5.py:258-263`) applied as a single tree_map BEFORE the
    key pass, exactly like the reference's update order;
  * the 6-clip key pass runs ALL views in parallel (`vmap` over the view
    axis): train-mode BN normalizes each view with its own batch
    statistics, so the view outputs never read the running-stats carry —
    only the (tiny) running-stats EMA chain is order-dependent, and it is
    rebuilt exactly afterwards with a 6-step fold over the per-view batch
    statistics (see `key_pass`), preserving the reference's sequential
    train-mode BN semantics without serializing the six encoder forwards
    (the scan formulation spent 26% of the stage-2 step waiting on it);
  * the loss is the class-sum rewrite of the reference's (B,HW,HW) masked
    similarity means (`stswincl_tpu/ops/contrastive.py`), symmetrized over
    the two query views; label maps are nearest-downsampled to feature
    resolution with torch index semantics (`PixPro_swin_v5.py:584-590`);
  * under a data mesh, batches shard over chips; because every loss term
    contracts features against per-class sums computed from the SHARDED
    batch, XLA all-gathers the class sums — giving the cross-chip negative
    pool the reference left unplugged (`contrast/util.py:47-58`) for free.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from stswincl_tpu.ops.contrastive import class_sum_contrastive_loss
from stswincl_tpu.ops.resize import resize_nearest


def contrast_momentum(step, total_steps: int, base_momentum: float = 0.99):
    """`1 - (1 - m) * (cos(pi * k / K) + 1) / 2` (`PixPro_swin_v5.py:263`)."""
    k = jnp.asarray(step, jnp.float32)
    return 1.0 - (1.0 - base_momentum) * (
        jnp.cos(jnp.pi * k / max(total_steps, 1)) + 1.0) / 2.0


class ContrastTrainState(struct.PyTreeNode):
    params_q: Any
    stats_q: Any
    params_k: Any
    stats_k: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation):
        """Key branch starts as an exact copy of the query branch
        (`PixPro_swin_v5.py:187-213`)."""
        return cls(
            params_q=variables["params"],
            stats_q=variables.get("batch_stats", {}),
            params_k=jax.tree.map(lambda x: x, variables["params"]),
            stats_k=jax.tree.map(lambda x: x,
                                 variables.get("batch_stats", {})),
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )


def _encode_train(model, params, stats, clip):
    out, updates = model.apply(
        {"params": params, "batch_stats": stats},
        clip, train=True, mutable=["batch_stats"])
    return out, updates["batch_stats"]


# the stats-chain fold constant MUST equal the in-module BatchNorm
# momentum; both import the same source of truth (models/norm.py), so a
# model family changing its momentum changes the fold with it
from stswincl_tpu.models.norm import BN_MOMENTUM


def make_key_pass(model) -> Callable:
    """Build the 6-view key-branch encoder: (params_k, stats_k, clips)
    -> (keys, new_stats), with clips (B, 6, ...) and keys stacked (6, ...).

    Encodes the views IN PARALLEL while preserving the reference's
    sequential train-mode BN running-stats semantics
    (`PixPro_swin_v5.py:366-557` runs six pasted forwards in view order).
    Train-mode BN normalizes each view with its own batch statistics, so
    the view OUTPUTS are independent of the running-stats carry — the six
    encoder forwards are embarrassingly parallel (`vmap`; the earlier
    `lax.scan` formulation serialized them, 26% of the stage-2 step).
    Only the running-stats EMA chain is order-dependent: feeding ZEROED
    running stats makes flax's in-module update emit exactly
    ``(1 - momentum) * batch_stat`` (the same multiply it performs inside
    the sequential chain), and the 6-step fold over those tiny tensors,
    ``s <- momentum * s + that_term``, reproduces the reference's
    ``s_{k+1} = m * s_k + (1 - m) * bs_k`` update term for term, in
    reference view order (equality-tested against the sequential scan in
    `tests/test_train.py`)."""

    def key_pass(params_k, stats_k, clips):
        zeros = jax.tree.map(jnp.zeros_like, stats_k)

        def one(clip):
            return _encode_train(model, params_k, zeros, clip)

        # clips: (B, 6, ...) -> vmap over axis 0 of (6, B, ...)
        keys, upd0 = jax.vmap(one)(jnp.swapaxes(clips, 0, 1))

        def fold(s, u):
            return jax.tree.map(
                lambda sv, uv: BN_MOMENTUM * sv + uv, s, u), None

        new_stats, _ = jax.lax.scan(fold, stats_k, upd0)
        return keys, new_stats  # keys: (6, B, h, w, 256)

    return key_pass


def make_key_pass_sequential(model) -> Callable:
    """The reference-ordered sequential formulation (scan over views,
    running stats threaded through each forward) — kept as the semantics
    oracle for `make_key_pass`'s parallel rewrite."""

    def key_pass(params_k, stats_k, clips):
        def body(stats, clip):
            out, new_stats = _encode_train(model, params_k, stats, clip)
            return new_stats, out

        new_stats, keys = jax.lax.scan(body, stats_k,
                                       jnp.swapaxes(clips, 0, 1))
        return keys, new_stats

    return key_pass


def make_contrast_train_step(
    model,
    tx: optax.GradientTransformation,
    class_num: int,
    total_steps: int,
    base_momentum: float = 0.99,
    ins_loss_weight: float = 0.0,
    remat_queries: bool = True,
) -> Callable:
    """(state, clips, labels) -> (state, metrics).

    clips: (B, 6, T, H, W, 3) — views [v1, v2, adjacent, neg1, neg2, neg3];
    labels: (B, 6, Hc, Wc) int32 crop-resolution label maps.

    `ins_loss_weight > 0` (reference `--pixpro-ins-loss-weight`,
    `PixPro_swin_v5.py:243-256`) requires a model built with
    `with_instance=True` and adds the instance-level BYOL-style term:
    `2 - 2*cos(pred_q(view_a), proj_k(view_b))`, symmetrized over the two
    query views; the key-side instance projector rides the same EMA as
    every other key parameter (`:287-289`).

    `remat_queries` checkpoints each query-view encoder forward
    (gradients are bitwise identical; the backward recomputes the view's
    activations instead of keeping both views' residuals live). Default
    ON: besides halving peak activation memory, it is the formulation
    that runs at the reference batch size on real hardware — a program
    holding BOTH query views' fused-epilogue backward residuals at
    bs=4/256x448 faults the TPU worker (device-bisected 2026-08-19:
    1-view grad passes, 2-view grad faults in any formulation — vmapped,
    unrolled, or with einsum attention — while the all-XLA path and the
    remat form pass; measured cost of the recompute is 300 ms/step vs
    the 275 ms/step the non-remat form posted in r3 before the fault
    appeared)."""
    with_instance = ins_loss_weight > 0.0

    _enc_q = (jax.checkpoint(_encode_train, static_argnums=(0,))
              if remat_queries else _encode_train)

    def encode_q(params, stats, clip):
        return _enc_q(model, params, stats, clip)

    def l2n(v):
        return v / jnp.maximum(
            jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True)), 1e-12)

    key_pass = make_key_pass(model)

    def to_flat(feat):
        B, h, w, C = feat.shape
        return feat.reshape(B, h * w, C)

    def downsample_labels(labels, h, w):
        # (B, 6, Hc, Wc) -> (B, 6, h*w) with torch 'nearest' indexing
        lab = resize_nearest(labels[..., None], h, w)[..., 0]
        return lab.reshape(labels.shape[0], labels.shape[1], h * w)

    def loss_fn(params_q, stats_q, params_k, stats_k, clips, labels):
        # query passes on views 0 and 1 (grad) — independent, like the key
        # pass: train-mode BN outputs never read the running-stats carry,
        # so the two view forwards run as unrolled independent programs and
        # the 2-step stats EMA chain is rebuilt afterwards (see
        # `make_key_pass` for the derivation). Unrolled rather than vmapped
        # because this pass is DIFFERENTIATED: vmap of the Pallas
        # custom_vjp backward kernels faults the TPU (their sequential-grid
        # weight-gradient accumulators index `pl.program_id` by literal
        # axis, which the batching rule's prepended grid dimension
        # invalidates — device-bisected 2026-08-19). The forward-only key
        # pass keeps vmap.
        zeros = jax.tree.map(jnp.zeros_like, stats_q)
        q1, upd_q1 = encode_q(params_q, zeros, clips[:, 0])
        q2, upd_q2 = encode_q(params_q, zeros, clips[:, 1])
        upd0_q = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                              upd_q1, upd_q2)
        stats_q2, _ = jax.lax.scan(
            lambda s, u: (jax.tree.map(
                lambda sv, uv: BN_MOMENTUM * sv + uv, s, u), None),
            stats_q, upd0_q)
        # key passes on all 6 views (no grad through params_k)
        keys, new_stats_k = key_pass(params_k, stats_k, clips)
        keys = jax.lax.stop_gradient(keys)

        if with_instance:
            q1, _, ipred1 = q1
            q2, _, ipred2 = q2
            keys, kproj, _ = keys  # kproj: (6, B, 256)

        B, h, w, C = q1.shape
        lab = downsample_labels(labels, h, w)  # (B, 6, hw)

        k_sets_1 = [(to_flat(keys[i]), lab[:, i]) for i in (1, 2, 3, 4, 5)]
        k_sets_2 = [(to_flat(keys[i]), lab[:, i]) for i in (0, 2, 3, 4, 5)]
        loss = (
            class_sum_contrastive_loss(to_flat(q1), lab[:, 0], k_sets_1, class_num)
            + class_sum_contrastive_loss(to_flat(q2), lab[:, 1], k_sets_2, class_num)
        )
        ins_loss = jnp.float32(0.0)
        if with_instance:
            cos12 = jnp.sum(l2n(ipred1) * l2n(kproj[1]), axis=-1)
            cos21 = jnp.sum(l2n(ipred2) * l2n(kproj[0]), axis=-1)
            ins_loss = (2.0 - 2.0 * jnp.mean(cos12)) + \
                       (2.0 - 2.0 * jnp.mean(cos21))
            loss = loss + ins_loss_weight * ins_loss
        return loss, (stats_q2, new_stats_k, ins_loss)

    @jax.jit
    def train_step(state: ContrastTrainState, clips, labels):
        # EMA momentum update of the key branch BEFORE the key forward
        # (`PixPro_swin_v5.py:366-367`)
        m = contrast_momentum(state.step, total_steps, base_momentum)
        params_k = jax.tree.map(lambda k, q: k * m + q * (1.0 - m),
                                state.params_k, state.params_q)

        (loss, (new_stats_q, new_stats_k, ins_loss)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(
                state.params_q, state.stats_q,
                params_k, state.stats_k, clips, labels)
        updates, new_opt = tx.update(grads, state.opt_state, state.params_q)
        new_params_q = optax.apply_updates(state.params_q, updates)
        new_state = state.replace(
            params_q=new_params_q, stats_q=new_stats_q,
            params_k=params_k, stats_k=new_stats_k,
            opt_state=new_opt, step=state.step + 1)
        metrics = {"loss": loss, "momentum": m,
                   "grad_norm": optax.global_norm(grads)}
        if with_instance:
            metrics["ins_loss"] = ins_loss
        return new_state, metrics

    return train_step
