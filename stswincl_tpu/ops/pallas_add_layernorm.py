"""Fused residual-add + LayerNorm — Pallas TPU kernel.

With attention fully fused (pallas_block_attention), the device trace shows
the LayerNorm/residual chains dominating the swin stack: 6.1 ms of 13.7 ms
in `convert_reduce` fusions (fp32 upcast round trips through HBM for 24
norms + 12 residual adds per forward). A standalone LN kernel LOST to XLA
here (it orphaned the adds that XLA had fused into the norms); this kernel
subsumes the add: one pass reads the two bf16 residual inputs, computes the
sum and fp32 statistics in-register, and writes the normalized output (and
optionally the sum, when the block needs it as the next shortcut).

Block usage (`SpaceTimeSwinBlock`, reference norm order):
    x      = shortcut + attn_out        ┐ fused: (sum, norm2(sum))
    mlp_in = norm2(x)                   ┘
    out    = norm1(x + mlp(mlp_in))     — fused: norm only

Numerics match flax/torch LayerNorm (biased variance, fp32 stats).
Differentiable via custom_vjp with the standard backward in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(rows: int, channels: int, isz: int = 2) -> int:
    """Largest row tile dividing `rows` with tile bytes bounded so the
    kernel's 6 live buffers (2 in + 2 out, double-buffered, + fp32 temps)
    stay under the 16MB VMEM cap (measured: 1024x1024 bf16 tiles overflow
    by 8KB at C=1024); dtype-aware for fp32 configs."""
    max_tk = max(8, (1024 * 1024) // max(channels * isz, 1) // 8 * 8)
    for tk in (1024, 512, 256, 128, 64, 32, 16, 8):
        if tk <= max_tk and rows % tk == 0:
            return tk
    return rows


def _add_ln_kernel(x_ref, y_ref, scale_ref, bias_ref, sum_ref, out_ref, *,
                   eps):
    s32 = x_ref[:].astype(jnp.float32) + y_ref[:].astype(jnp.float32)
    sum_ref[:] = s32.astype(sum_ref.dtype)
    mu = jnp.mean(s32, axis=-1, keepdims=True)
    xc = s32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    n = xc * jax.lax.rsqrt(var + eps)
    n = n * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    out_ref[:] = n.astype(out_ref.dtype)


def _add_ln_kernel_noout(x_ref, y_ref, scale_ref, bias_ref, out_ref, *, eps):
    s32 = x_ref[:].astype(jnp.float32) + y_ref[:].astype(jnp.float32)
    mu = jnp.mean(s32, axis=-1, keepdims=True)
    xc = s32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    n = xc * jax.lax.rsqrt(var + eps)
    n = n * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    out_ref[:] = n.astype(out_ref.dtype)


def _run_add_ln(x2d, y2d, scale, bias, eps, return_sum, interpret):
    R, C = x2d.shape
    tk = _pick_tile(R, C, jnp.dtype(x2d.dtype).itemsize)
    grid = (R // tk,)
    row_spec = pl.BlockSpec((tk, C), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, C), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    if return_sum:
        return pl.pallas_call(
            functools.partial(_add_ln_kernel, eps=eps),
            grid=grid,
            in_specs=[row_spec, row_spec, vec_spec, vec_spec],
            out_specs=(row_spec, row_spec),
            out_shape=(jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
                       jax.ShapeDtypeStruct(x2d.shape, x2d.dtype)),
            interpret=interpret,
        )(x2d, y2d, scale[None], bias[None])
    out = pl.pallas_call(
        functools.partial(_add_ln_kernel_noout, eps=eps),
        grid=grid,
        in_specs=[row_spec, row_spec, vec_spec, vec_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=interpret,
    )(x2d, y2d, scale[None], bias[None])
    return None, out


def _ln_math(s32, scale, bias, eps):
    mu = jnp.mean(s32, axis=-1, keepdims=True)
    xc = s32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (xc * inv) * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def add_layer_norm_ref(x, y, scale, bias, eps=1e-5):
    """XLA reference: (x + y, LayerNorm(x + y)) with fp32 stats."""
    s32 = x.astype(jnp.float32) + y.astype(jnp.float32)
    n = _ln_math(s32, scale, bias, eps)
    return s32.astype(x.dtype), n.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_add_layer_norm(x, y, scale, bias, eps=1e-5, return_sum=True,
                         interpret=False):
    """(x + y, LayerNorm(x + y)) in one HBM pass (Pallas).

    Returns (sum, normed) when `return_sum`, else (None, normed).
    """
    *lead, C = x.shape
    s, n = _run_add_ln(x.reshape(-1, C), y.reshape(-1, C), scale, bias, eps,
                       return_sum, interpret)
    n = n.reshape(*lead, C)
    return (s.reshape(*lead, C) if return_sum else None), n


def _faln_fwd(x, y, scale, bias, eps, return_sum, interpret):
    out = fused_add_layer_norm(x, y, scale, bias, eps, return_sum, interpret)
    return out, (x, y, scale)


def _faln_bwd(eps, return_sum, interpret, res, g):
    x, y, scale = res
    gs, gn = g
    s32 = x.astype(jnp.float32) + y.astype(jnp.float32)
    mu = jnp.mean(s32, axis=-1, keepdims=True)
    xc = s32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    shat = xc * inv

    gn32 = gn.astype(jnp.float32)
    gsc = gn32 * scale.astype(jnp.float32)
    m1 = jnp.mean(gsc, axis=-1, keepdims=True)
    m2 = jnp.mean(gsc * shat, axis=-1, keepdims=True)
    ds = (gsc - m1 - shat * m2) * inv
    if return_sum and gs is not None:
        ds = ds + gs.astype(jnp.float32)

    reduce_dims = tuple(range(x.ndim - 1))
    dscale = jnp.sum(gn32 * shat, axis=reduce_dims)
    dbias = jnp.sum(gn32, axis=reduce_dims)
    return (ds.astype(x.dtype), ds.astype(y.dtype),
            dscale.astype(scale.dtype), dbias.astype(scale.dtype))


fused_add_layer_norm.defvjp(_faln_fwd, _faln_bwd)
