"""Pixel-wise supervised-contrastive loss (the "inter-video relation").

Reference semantics (`/root/reference/pixcontrast_18/contrast/models/
PixPro_swin_v5.py:48-129,565-597`): for each query pixel i, its positive
score P_i is the mean cosine similarity to *same-class* pixels pooled over
all 5 key sets (second view, adjacent clip, 3 cross-video clips), and its
negative score N_i is the sum over key sets of the per-set mean similarity
to *different-class* pixels; the loss is ``-mean log(e^P / (e^P + e^N))``,
symmetrized over the two query views by the caller.

The reference materializes (B, HW, HW) one-hot agreement masks via bmm —
O(HW^2 * D) compute and O(HW^2) memory per key set. Because the masks are
exactly class-agreement indicators, the masked sums factor through per-class
feature sums:

    sum_j 1[l_q(i) == l_s(j)] * (q_i . k_j)  =  q_i . S_s[l_q(i)]
    where  S_s[c] = sum_j 1[l_s(j) == c] * k_j

so each key set costs one (HW x D x C) segment-sum matmul plus one
(HW x D x C) query-against-class-sums matmul — O(HW * C * D), a ~70x FLOP
reduction at the shipped 32x56 feature resolution with 26 classes, identical
algebra (verified against a naive implementation in
`tests/test_contrastive.py`). Both matmuls are MXU-shaped and the negative
terms come free via totals minus positives.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _per_set_stats(
    q: jnp.ndarray,
    q_labels: jnp.ndarray,
    k: jnp.ndarray,
    k_labels: jnp.ndarray,
    class_num: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Positive/negative masked-sum statistics for one key set.

    Args:
      q: (B, HW, D) L2-normalized query features.
      q_labels: (B, HW) int labels of query pixels.
      k: (B, HW_k, D) L2-normalized key features.
      k_labels: (B, HW_k) int labels of key pixels.

    Returns:
      pos_sum, pos_cnt, neg_sum, neg_cnt — each (B, HW) fp32.
    """
    onehot_k = jax.nn.one_hot(k_labels, class_num, dtype=jnp.float32)  # (B, HWk, C)
    kf = k.astype(jnp.float32)
    # Per-class feature sums and counts over the key set.
    class_sums = jnp.einsum(
        "bjc,bjd->bcd", onehot_k, kf, preferred_element_type=jnp.float32
    )  # (B, C, D)
    class_cnts = jnp.sum(onehot_k, axis=1)  # (B, C)

    qf = q.astype(jnp.float32)
    # Query-pixel similarity against every class sum, then gather own class.
    sims = jnp.einsum(
        "bid,bcd->bic", qf, class_sums, preferred_element_type=jnp.float32
    )  # (B, HW, C)
    idx = q_labels[..., None].astype(jnp.int32)
    pos_sum = jnp.take_along_axis(sims, idx, axis=-1)[..., 0]
    pos_cnt = jnp.take_along_axis(
        jnp.broadcast_to(class_cnts[:, None, :], sims.shape), idx, axis=-1
    )[..., 0]

    total_sum = jnp.sum(sims, axis=-1)  # == q_i . sum_j (valid) k_j
    # key pixels with out-of-range labels (the geometric-warp LABEL_FILL,
    # data/rand_augment.py) get an all-zero one_hot row: excluded from the
    # class sums above, so they must be excluded from the count too
    valid_k_cnt = jnp.sum(class_cnts, axis=-1)[:, None]  # (B, 1)
    neg_sum = total_sum - pos_sum
    neg_cnt = valid_k_cnt - pos_cnt
    return pos_sum, pos_cnt, neg_sum, neg_cnt


def pixel_pair_stats(
    q: jnp.ndarray,
    q_labels: jnp.ndarray,
    keys: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    class_num: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel pooled positive mean P and summed negative means N.

    Mirrors reference `regression_loss` aggregation (`PixPro_swin_v5.py:
    119-123`): P pools numerators/denominators across all key sets; N sums
    per-set means.
    """
    pos_num = 0.0
    pos_den = 0.0
    neg = 0.0
    for k, k_labels in keys:
        ps, pc, ns, nc = _per_set_stats(q, q_labels, k, k_labels, class_num)
        pos_num = pos_num + ps
        pos_den = pos_den + pc
        neg = neg + ns / (nc + 1e-6)
    P = pos_num / (pos_den + 1e-6)
    return P, neg


def class_sum_contrastive_loss(
    q: jnp.ndarray,
    q_labels: jnp.ndarray,
    keys: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    class_num: int,
) -> jnp.ndarray:
    """One direction of the reference consistency loss.

    ``-mean log(e^P / (e^P + e^N) + 1e-6)`` exactly as `PixPro_swin_v5.py:
    124-128`. The caller symmetrizes over the two query views.

    Query pixels whose label is outside [0, class_num) — the geometric
    warp's LABEL_FILL=255 (`data/rand_augment.py`) — are excluded from the
    mean: `take_along_axis` would otherwise CLAMP the index to the last
    real class and contrastively pull out-of-frame pixels toward it. When
    every label is in range (the reference's own menu) the mask is all-ones
    and the loss is unchanged.
    """
    P, N = pixel_pair_stats(q, q_labels, keys, class_num)
    # log(e^P/(e^P+e^N) + eps); P, N are bounded (|P|,|N|<=5) so the direct
    # form is numerically safe, matching the reference epsilon placement.
    ratio = jnp.exp(P) / (jnp.exp(P) + jnp.exp(N))
    valid = ((q_labels >= 0) & (q_labels < class_num)).astype(jnp.float32)
    terms = jnp.log(ratio + 1e-6) * valid
    return -jnp.sum(terms) / jnp.maximum(jnp.sum(valid), 1.0)
