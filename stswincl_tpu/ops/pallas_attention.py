"""Fused space-time window attention — Pallas TPU kernel.

The hottest op in the network (SURVEY.md §5 north star): softmax(q·kᵀ·scale
+ relative-bias + SW-MSA-mask)·v over joint space-time windows. The XLA
einsum formulation materializes the (Bw, heads, T·N, T·N) score tensor in
HBM between the two matmuls (~42 MB per block at stage-1 shapes, ~500 MB of
HBM traffic per forward). This kernel keeps the whole (T·N, T·N) score tile
in VMEM: one grid cell per (window, head) computes q·kᵀ, adds the bias and
(for SW-MSA) the per-window mask, softmaxes in fp32 and applies ·v without
ever writing scores to HBM.

Shapes at the shipped configs make this a perfect MXU fit: T·N = 128 (stage
1: 2 frames x 8x8 windows) or 32, head_dim = 128 — full 128x128 tiles.

The op is differentiable via custom_vjp: forward runs the Pallas kernel,
backward uses the standard einsum gradient (recomputing scores — flash-style
recompute, so training saves the forward HBM traffic too and the bwd
matches XLA's autodiff numerics).

The public wrapper falls back to the pure-XLA einsum implementation
(`stswincl_tpu.ops.attention`) on non-TPU backends and under interpret-mode
tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stswincl_tpu.ops.attention import space_time_window_attention


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *,
                 scale, wpc):
    """One cell = `wpc` consecutive windows of one head; scores stay in VMEM.

    Refs: q/k/v (wpc, 1, TN, hd); bias (1, TN, TN); mask (wpc, TN, TN);
    out (wpc, 1, TN, hd). The window loop is static (unrolled), each
    iteration two MXU-shaped (TN, hd)x(TN, TN) contractions.
    """
    bias = bias_ref[0].astype(jnp.float32)
    for w in range(wpc):
        # native-dtype MXU inputs with fp32 accumulation — the einsum
        # path's semantics (ops/attention.py) and the fast MXU path;
        # post-matmul fp32 scale + reciprocal-multiply softmax match the
        # other attention implementations' rounding
        q = q_ref[w, 0]
        k = k_ref[w, 0]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TN, TN)
        scores = scores * jnp.float32(scale) + bias
        scores = scores + mask_ref[w].astype(jnp.float32)
        # numerically-stable softmax in fp32, fully in registers/VMEM
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
        out = jnp.dot(p.astype(v_ref.dtype), v_ref[w, 0],
                      preferred_element_type=jnp.float32)
        out_ref[w, 0] = out.astype(out_ref.dtype)


def _pick_windows_per_cell(nW: int, Bw: int) -> int:
    """Largest divisor of nW (and Bw) <= 8 to amortize per-cell overhead."""
    for wpc in (8, 5, 4, 2):
        if nW % wpc == 0 and Bw % wpc == 0:
            return wpc
    return 1


def _pallas_attention(q, k, v, bias_tiled, mask_tiled, scale, interpret=False):
    """q/k/v: (Bw, heads, TN, hd) with window-minor ordering (index =
    batch * nW + window); bias_tiled: (heads, TN, TN); mask_tiled:
    (nW, TN, TN) with nW dividing Bw."""
    Bw, heads, TN, hd = q.shape
    nW = mask_tiled.shape[0]
    if nW == 1:  # W-MSA zero mask: every window shares it
        wpc = _pick_windows_per_cell(8 if Bw % 8 == 0 else 1, Bw)
        mask_tiled = jnp.broadcast_to(mask_tiled, (wpc, TN, TN))
        nW_blocks = 1
    else:
        wpc = _pick_windows_per_cell(nW, Bw)
        nW_blocks = nW // wpc

    grid = (Bw // wpc, heads)
    kernel = functools.partial(_attn_kernel, scale=scale, wpc=wpc)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((wpc, 1, TN, hd), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wpc, 1, TN, hd), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wpc, 1, TN, hd), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN, TN), lambda b, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wpc, TN, TN), lambda b, h: (b % nW_blocks, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wpc, 1, TN, hd), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, v.dtype),
        interpret=interpret,
    )(q, k, v, bias_tiled, mask_tiled)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_window_attention(q, k, v, bias_tiled, mask_tiled, scale,
                           interpret=False):
    """Differentiable fused window attention (see module docstring).

    Args mirror :func:`space_time_window_attention` but with bias/mask
    already tiled to (.., TN, TN) so the kernel is pure compute.
    """
    return _pallas_attention(q, k, v, bias_tiled, mask_tiled, scale,
                             interpret)


def _fwd(q, k, v, bias_tiled, mask_tiled, scale, interpret):
    out = _pallas_attention(q, k, v, bias_tiled, mask_tiled, scale, interpret)
    return out, (q, k, v, bias_tiled, mask_tiled)


def _bwd(scale, interpret, res, g):
    """Flash-style recompute backward with standard einsum math."""
    q, k, v, bias_tiled, mask_tiled = res
    Bw, heads, TN, hd = q.shape
    nW = mask_tiled.shape[0]

    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)

    scores = jnp.einsum("bhqd,bhkd->bhqk", qf, kf,
                        preferred_element_type=jnp.float32)
    scores = scores + bias_tiled[None].astype(jnp.float32)
    m = mask_tiled.astype(jnp.float32)
    scores = (scores.reshape(Bw // nW, nW, heads, TN, TN)
              + m[None, :, None]).reshape(Bw, heads, TN, TN)
    p = jax.nn.softmax(scores, axis=-1)

    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf,
                    preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf,
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf,
                    preferred_element_type=jnp.float32)
    dbias = jnp.sum(ds, axis=0)  # (heads, TN, TN)
    dmask = jnp.sum(ds.reshape(Bw // nW, nW, heads, TN, TN), axis=(0, 2))

    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias_tiled.dtype), dmask.astype(mask_tiled.dtype))


fused_window_attention.defvjp(_fwd, _bwd)


def _is_tpu_backend() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


# Measured on v5e (tools/profile_components.py): the one-(window,head)-per-
# cell kernel underperforms the XLA einsum path (19.8 vs 17.3 ms for the
# full stack) — per-cell dispatch overhead dominates at 4 MFLOP/cell. Until
# the window-batched kernel wins, 'auto' resolves to einsum.
_AUTO_USES_PALLAS = False


def space_time_window_attention_fused(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: float,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for `space_time_window_attention` that routes to
    the fused Pallas kernel on TPU (einsum fallback elsewhere)."""
    if use_pallas is None:
        use_pallas = _AUTO_USES_PALLAS and _is_tpu_backend()
    if not (use_pallas or interpret):
        return space_time_window_attention(q, k, v, rel_bias, mask, scale)

    Bw, heads, TN, hd = q.shape
    N = rel_bias.shape[-1]
    T = TN // N
    bias_tiled = jnp.tile(rel_bias.astype(jnp.float32), (1, T, T))
    if mask is None:
        mask_tiled = jnp.zeros((1, TN, TN), jnp.float32)
    else:
        mask_tiled = jnp.tile(mask.astype(jnp.float32), (1, T, T))
    return fused_window_attention(q, k, v, bias_tiled, mask_tiled, scale,
                                  interpret)
