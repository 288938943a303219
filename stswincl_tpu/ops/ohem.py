"""Online hard-example-mining cross entropy, static-shape formulation.

Reference semantics (`/root/reference/seg18/utils/losses.py:16-40`):
per-pixel CE (ignored pixels contribute 0), sorted descending; if the
`n_min`-th largest loss still exceeds ``-log(thresh)`` keep every pixel above
the threshold, otherwise keep exactly the top `n_min` pixels; return the mean
of the kept losses.

The reference uses a data-dependent boolean filter which has a dynamic output
shape — untraceable under jit. Here both branches are computed as masked
means over the full static-size loss vector and selected with `jnp.where`,
which XLA compiles to one sort + two fused reductions (no host sync, no
recompilation).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def ohem_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    n_min: int,
    thresh: float = 0.7,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """OHEM cross-entropy.

    Args:
      logits: (..., C) unnormalized class scores (any leading shape).
      labels: (...) integer class labels; entries equal to `ignore_index`
        contribute zero loss and are never selected.
      n_min: minimum number of pixels kept (reference uses H*W/16 per batch
        element times batch... instantiated as a flat count).
      thresh: probability threshold; pixels with CE above -log(thresh) are
        "hard".
      ignore_index: label value to ignore.

    Returns:
      Scalar mean loss over the mined pixel set, fp32.
    """
    C = logits.shape[-1]
    flat_logits = logits.reshape(-1, C).astype(jnp.float32)
    flat_labels = labels.reshape(-1)

    valid = flat_labels != ignore_index
    safe_labels = jnp.where(valid, flat_labels, 0)
    log_probs = jax.nn.log_softmax(flat_logits, axis=-1)
    logp = jnp.take_along_axis(
        log_probs, safe_labels[:, None].astype(jnp.int32), axis=-1
    )[:, 0]
    loss = jnp.where(valid, -logp, 0.0)

    return _ohem_select(loss, n_min, thresh)


def _ohem_select_sort(loss: jnp.ndarray, n_min: int,
                      thresh: float) -> jnp.ndarray:
    """Sort-based OHEM branch selection (the direct transcription of the
    reference; kept as the oracle for `_ohem_select`)."""
    loss_thresh = math.log(1.0 / thresh)  # -log(thresh)
    sorted_desc = -jnp.sort(-loss)

    hard = loss > loss_thresh
    n_hard = jnp.sum(hard)
    mean_hard = jnp.sum(jnp.where(hard, loss, 0.0)) / jnp.maximum(n_hard, 1)
    mean_topk = jnp.mean(sorted_desc[:n_min])

    use_thresh = sorted_desc[n_min] > loss_thresh
    return jnp.where(use_thresh, mean_hard, mean_topk)


def _kth_largest_nonneg(loss: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact k-th largest (1-indexed) of a NON-NEGATIVE f32 vector via
    bisection on the float bit pattern (non-negative IEEE floats order
    identically to their int32 bits), so no O(n log n) sort is needed —
    just 31 masked counts."""
    bits = jax.lax.bitcast_convert_type(loss, jnp.int32)

    def body(state):
        lo, hi = state  # invariant: count(bits > hi) < k <= count(bits >= lo)
        mid = lo + (hi - lo) // 2
        cnt = jnp.sum(bits > mid)
        # if at least k values exceed mid, the k-th largest is > mid
        lo2 = jnp.where(cnt >= k, mid + 1, lo)
        hi2 = jnp.where(cnt >= k, hi, mid)
        return lo2, hi2

    def cond(state):
        return state[0] < state[1]

    lo, hi = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0x7F7FFFFF)))
    # hi is the smallest v with count(bits > v) < k -> the k-th largest
    return jax.lax.bitcast_convert_type(hi, jnp.float32)


def _ohem_select(loss: jnp.ndarray, n_min: int, thresh: float) -> jnp.ndarray:
    """OHEM branch selection over a flat per-pixel loss vector.

    Equal to `_ohem_select_sort` (equality-tested incl. ties) but without
    the full sort: the reference only needs the (n_min+1)-th largest loss
    (for the branch condition) and the mean of the top n_min (for the
    top-k branch) — both derivable from masked counts/sums plus one exact
    order statistic. The 2.6M-pixel sort + its selection fusions measured
    ~23 ms/step in the stage-1 training trace.
    """
    loss_thresh = math.log(1.0 / thresh)  # -log(thresh)

    # CE is mathematically >= 0 but rounding in lse - picked can produce
    # tiny negatives; `_kth_largest_nonneg`'s bit-order trick requires
    # non-negative inputs, so clamp (free: fuses into the producing pass)
    loss = jnp.maximum(loss, 0.0)

    hard = loss > loss_thresh
    n_hard = jnp.sum(hard)
    mean_hard = jnp.sum(jnp.where(hard, loss, 0.0)) / jnp.maximum(n_hard, 1)

    # sorted_desc[n_min] > t  <=>  count(loss > t) > n_min
    use_thresh = n_hard > n_min

    # top-k mean with exact tie handling: values strictly above the k-th
    # largest v* contribute themselves; the remaining k - count(> v*)
    # slots are copies of v*
    vk = _kth_largest_nonneg(loss, n_min)
    gt = loss > vk
    n_gt = jnp.sum(gt)
    sum_topk = jnp.sum(jnp.where(gt, loss, 0.0)) + (n_min - n_gt) * vk
    mean_topk = sum_topk / n_min

    return jnp.where(use_thresh, mean_hard, mean_topk)


def ohem_cross_entropy_channels_first(
    logits_cf: jnp.ndarray,
    labels: jnp.ndarray,
    n_min: int,
    thresh: float = 0.7,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """OHEM CE on (B, C, H, W) logits — the TPU-friendly layout.

    With NHWC logits the class axis sits in the lane dimension: any
    materialized fp32 (..., num_classes) tensor pads num_classes -> 128
    lanes (a measured 10.7x HBM expansion at 12 classes, the #1 allocation
    in the training-step memory profile). Channels-first keeps W in the
    lanes; the CE is computed via logsumexp/gather reductions over axis 1
    so no (..., C)-minor intermediate ever exists.
    """
    loss = per_pixel_ce_channels_first(logits_cf, labels, ignore_index)
    return _ohem_select(loss.reshape(-1), n_min, thresh)


def per_pixel_ce_channels_first(
    logits_cf: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = -1
) -> jnp.ndarray:
    """Per-pixel CE map from (B, C, H, W) logits via reductions over axis 1
    (no (..., C)-minor intermediates); ignored pixels contribute 0."""
    lf = logits_cf.astype(jnp.float32)
    C = lf.shape[1]
    m = jnp.max(lf, axis=1)
    lse = m + jnp.log(jnp.sum(jnp.exp(lf - m[:, None]), axis=1))

    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    # label-class pick as a one-hot masked reduction, NOT take_along_axis:
    # a per-pixel gather over 2.6M indices lowered to a 40 ms/step custom
    # fusion in the training trace (~1.6 GB/s effective); the comparison +
    # multiply + sum fuses into one vectorized pass over the logits
    class_ids = jnp.arange(C, dtype=jnp.int32).reshape(1, C, 1, 1)
    picked = jnp.sum(
        jnp.where(safe[:, None] == class_ids, lf, 0.0), axis=1)
    return jnp.where(valid, lse - picked, 0.0)
