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
    query_mode: Optional[str] = None,
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
    appeared).

    `query_mode` (overrides `remat_queries` when given) selects the
    query-grad formulation:

      * ``"scan"`` (default on TPU) — the two query-view value_and_grads
        run as a `lax.scan` accumulating the param-grad sum: by loop
        semantics only ONE view's backward residual set is ever live,
        dodging the dual-residual device fault WITHOUT the remat recompute
        (grads equal the joint backward by linearity; equality-tested in
        tests/test_train.py). Device-verified at the reference config
        2026-08-19: 263 ms/step (15.2 samples/s) vs remat's 300 and the
        275 the faulting co-resident form posted in r3 — faster than both,
        no fault.
      * ``"remat"`` (default off-TPU) — `jax.checkpoint` each query
        forward; bitwise-identical grads, ~9% recompute cost.
      * ``"unrolled"`` — both views' residuals co-resident. Faults the
        TPU worker at the reference config
        (tools/repro_dual_grad_fault.py); kept as the bisect record."""
    with_instance = ins_loss_weight > 0.0
    if query_mode is None:
        from stswincl_tpu.ops.pallas_attention import _is_tpu_backend
        if remat_queries and _is_tpu_backend():
            query_mode = "scan"
        else:
            query_mode = "remat" if remat_queries else "unrolled"
    assert query_mode in ("remat", "unrolled", "scan"), query_mode

    _enc_q = (jax.checkpoint(_encode_train, static_argnums=(0,))
              if query_mode == "remat" else _encode_train)

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

    # view v's key set: every view except v among the first two, all of
    # 2..5 always (reference symmetrization, PixPro_swin_v5.py:558-571)
    _KIDX = ((1, 2, 3, 4, 5), (0, 2, 3, 4, 5))

    def scan_value_and_grad(params_q, stats_q, params_k, stats_k, clips,
                            labels):
        """Same loss/grads/aux as `jax.value_and_grad(loss_fn)`, but the two
        query-view backwards run SEQUENTIALLY inside a lax.scan that
        accumulates the param-grad sum — loop semantics guarantee only one
        view's fused-kernel backward residual set is live at a time (the
        co-residency of two is the bisected TPU-worker-fault trigger), with
        none of remat's recompute. Equal by linearity: grad(l1 + l2) =
        grad(l1) + grad(l2); the view losses are separable."""
        keys, new_stats_k = key_pass(params_k, stats_k, clips)
        keys = jax.lax.stop_gradient(keys)
        kproj = None
        if with_instance:
            keys, kproj, _ = keys
        _, B, h, w, C = keys.shape
        lab = downsample_labels(labels, h, w)          # (B, 6, hw)
        lab_v = jnp.swapaxes(lab, 0, 1)                # (6, B, hw)
        keys_flat = keys.reshape(6, B, h * w, C)

        kidx = jnp.asarray(_KIDX)                      # (2, 5)
        kf = keys_flat[kidx]                           # (2, 5, B, hw, C)
        kl = lab_v[kidx]                               # (2, 5, B, hw)
        clips_q = jnp.swapaxes(clips[:, :2], 0, 1)     # (2, B, T, H, W, 3)
        kp = (jnp.stack([kproj[1], kproj[0]]) if with_instance
              else jnp.zeros((2, 1)))

        zeros = jax.tree.map(jnp.zeros_like, stats_q)

        def view_loss(params, clip_v, qlab_v, kf_v, kl_v, kp_v):
            out, upd = _encode_train(model, params, zeros, clip_v)
            ins_v = jnp.float32(0.0)
            if with_instance:
                q, _, ipred = out
                cos = jnp.sum(l2n(ipred) * l2n(kp_v), axis=-1)
                ins_v = 2.0 - 2.0 * jnp.mean(cos)
            else:
                q = out
            k_sets = [(kf_v[i], kl_v[i]) for i in range(5)]
            lv = class_sum_contrastive_loss(to_flat(q), qlab_v, k_sets,
                                            class_num)
            total = lv + ins_loss_weight * ins_v if with_instance else lv
            return total, (upd, ins_v)

        def body(carry, xs):
            gsum, lsum, isum = carry
            clip_v, qlab_v, kf_v, kl_v, kp_v = xs
            (lv, (upd, ins_v)), gv = jax.value_and_grad(
                view_loss, has_aux=True)(params_q, clip_v, qlab_v, kf_v,
                                         kl_v, kp_v)
            return (jax.tree.map(jnp.add, gsum, gv), lsum + lv,
                    isum + ins_v), upd

        gzero = jax.tree.map(jnp.zeros_like, params_q)
        (grads, loss, ins_loss), upd0_q = jax.lax.scan(
            body, (gzero, jnp.float32(0.0), jnp.float32(0.0)),
            (clips_q, lab_v[:2], kf, kl, kp))
        stats_q2, _ = jax.lax.scan(
            lambda s, u: (jax.tree.map(
                lambda sv, uv: BN_MOMENTUM * sv + uv, s, u), None),
            stats_q, upd0_q)
        return (loss, (stats_q2, new_stats_k, ins_loss)), grads

    @jax.jit
    def train_step(state: ContrastTrainState, clips, labels):
        # EMA momentum update of the key branch BEFORE the key forward
        # (`PixPro_swin_v5.py:366-367`)
        m = contrast_momentum(state.step, total_steps, base_momentum)
        params_k = jax.tree.map(lambda k, q: k * m + q * (1.0 - m),
                                state.params_k, state.params_q)

        vag = (scan_value_and_grad if query_mode == "scan"
               else jax.value_and_grad(loss_fn, has_aux=True))
        (loss, (new_stats_q, new_stats_k, ins_loss)), grads = vag(
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
