"""Joint space-time window attention.

The core contraction of the STswin model: within each spatial window, all
T * N tokens (N = window_size^2 tokens per frame, T frames) attend jointly.
Matches the reference `WindowAttention.forward`
(`/root/reference/seg18/net/Ours/swin_512.py:109-141`):

  * a single 2D relative-position bias table indexed per (i, j) token pair,
    tiled across the T x T frame-block structure (no temporal bias term);
  * the SW-MSA region mask likewise tiled across frame blocks;
  * softmax over the joint T*N key axis.

TPU notes: at the shipped configs the score matrix is (T*N, T*N) =
(128, 128) or (32, 32) — exactly one MXU tile in the large case — with the
window count folded into the batch dimension, so a plain einsum formulation
already maps onto the MXU with full tiles; XLA fuses the bias/mask adds and
softmax into the matmul pipeline. Accumulation is forced to fp32 via
`preferred_element_type` so bf16 activations lose no accuracy in the
softmax statistics.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import jax


def space_time_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: float,
) -> jnp.ndarray:
    """Attention over joint space-time windows.

    Args:
      q, k, v: (Bw, heads, T*N, head_dim) where Bw = batch * num_windows and
        the T*N axis is ordered [frame0 tokens..., frame1 tokens...].
      rel_bias: (heads, N, N) relative-position bias for one frame pair;
        tiled T x T internally (reference `swin_512.py:124`).
      mask: optional (nW, N, N) additive SW-MSA mask (0 / -100); tiled T x T
        and broadcast over batch groups of nW windows (`swin_512.py:127-131`).
      scale: query scaling factor (head_dim ** -0.5).

    Returns:
      (Bw, heads, T*N, head_dim) attention output, dtype of v.
    """
    Bw, heads, TN, _ = q.shape
    N = rel_bias.shape[-1]
    T = TN // N

    # scale applied to the fp32 score accumulator AFTER the matmul (not to
    # the bf16 q tensor): strictly more accurate, one fewer VPU pass over
    # (TN, hd) in the Pallas kernels that share this exact formulation
    attn = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    bias = jnp.tile(rel_bias.astype(jnp.float32), (1, T, T))  # (heads, TN, TN)
    attn = attn * jnp.float32(scale) + bias[None]

    if mask is not None:
        nW = mask.shape[0]
        m = jnp.tile(mask.astype(jnp.float32), (1, T, T))  # (nW, TN, TN)
        attn = attn.reshape(Bw // nW, nW, heads, TN, TN) + m[None, :, None]
        attn = attn.reshape(Bw, heads, TN, TN)

    # explicit reciprocal-multiply softmax — the shared rounding contract
    # with the Pallas kernels (a VPU divide per score element is the single
    # most expensive op in their softmax chain; 1/sum is one divide per ROW)
    mx = jnp.max(attn, axis=-1, keepdims=True)
    e = jnp.exp(attn - mx)
    p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(v.dtype)
