"""Fused LayerNorm — Pallas TPU kernel.

Profiling the swin stack on v5e (`tools/profile_components.py` + a device
trace) shows ~35% of stack time in `convert_reduce` fusions: flax LayerNorm
upcasts the bf16 activations to fp32 in HBM to compute statistics, costing
multiple full-tensor round trips per norm (24 norms per forward). This
kernel reads the bf16 tensor once, computes mean/variance in fp32
in-register, and writes the normalized bf16 output once — ~3x less HBM
traffic per norm.

Numerics match torch/flax LayerNorm: biased variance, fp32 statistics,
eps inside the rsqrt. Differentiable via custom_vjp with the standard
LayerNorm backward in XLA (recompute-style, no extra residual traffic
beyond x, scale).

The public wrapper falls back to plain XLA math off-TPU; the flax module
`FusedLayerNorm` uses the same 'scale'/'bias' parameter names as
nn.LayerNorm so variable trees and the torch importer are unchanged.

STATUS: benchmark artifact, not routed in any model path. In end-to-end
measurement the STANDALONE kernel lost to XLA (it orphans the residual adds
XLA had fused into the norm) and was superseded by
`pallas_add_layernorm.fused_add_layer_norm`, which subsumes the add. Kept
(with its tests) as the documented negative result and a baseline for
future kernel comparisons; deliberately not exported from `ops/__init__`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, scale_ref, bias_ref, out_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)  # (TK, C)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    out_ref[:] = y.astype(out_ref.dtype)


def _pallas_layer_norm(x2d, scale, bias, eps, interpret=False):
    R, C = x2d.shape
    tk = 256
    while R % tk != 0:
        tk //= 2
    grid = (R // tk,)
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tk, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tk, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=interpret,
    )(x2d, scale[None], bias[None])


def _xla_layer_norm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layer_norm(x, scale, bias, eps=1e-5, interpret=False):
    """LayerNorm over the last axis; Pallas-fused forward on TPU."""
    *lead, C = x.shape
    x2d = x.reshape(-1, C)
    y = _pallas_layer_norm(x2d, scale, bias, eps, interpret)
    return y.reshape(*lead, C)


def _fln_fwd(x, scale, bias, eps, interpret):
    y = fused_layer_norm(x, scale, bias, eps, interpret)
    return y, (x, scale)


def _fln_bwd(eps, interpret, res, g):
    x, scale = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    gs = gf * scale.astype(jnp.float32)
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    dx = (gs - m1 - xhat * m2) * inv
    reduce_dims = tuple(range(x.ndim - 1))
    dscale = jnp.sum(gf * xhat, axis=reduce_dims)
    dbias = jnp.sum(gf, axis=reduce_dims)
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


fused_layer_norm.defvjp(_fln_fwd, _fln_bwd)


def _is_tpu_backend() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


class FusedLayerNorm(nn.Module):
    """Drop-in nn.LayerNorm replacement (same param names) with a fused
    Pallas forward on TPU. `impl`: 'auto' | 'pallas' | 'xla'."""

    epsilon: float = 1e-5
    impl: str = "auto"
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        use_pallas = (self.impl == "pallas"
                      or (self.impl == "auto" and _is_tpu_backend()))
        if use_pallas:
            return fused_layer_norm(x, scale, bias, self.epsilon,
                                    self.impl == "interpret")
        if self.impl == "interpret":
            return fused_layer_norm(x, scale, bias, self.epsilon, True)
        return _xla_layer_norm(x, scale, bias, self.epsilon)
