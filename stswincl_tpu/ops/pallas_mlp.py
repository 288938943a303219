"""Fused MLP (fc1 -> GELU -> fc2) — Pallas TPU kernel.

After fusing attention and the residual+LayerNorm chains, the device trace
shows the remaining swin-stack hotspot is the MLP's elementwise traffic
(~7.6 of 13.6 ms in generic fusions): the (tokens, 4C) fc1 output and its
GELU round-trip through HBM (~250 MB per block). This kernel keeps the
hidden activations in VMEM: each grid cell computes a row-tile's fc1
partial, applies GELU in-register, and accumulates the fc2 contribution
into an fp32 scratch, iterating hidden-dim blocks so stage-2 (C=1024,
hidden 4096) weights never need to be fully resident.

Numerics: fp32 accumulation for both matmuls, exact-erf GELU by default
(torch parity; tanh approximation selectable).

Differentiable via custom_vjp (backward = jax.vjp of the XLA reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_poly(x):
    """Abramowitz & Stegun 7.1.26 rational erf approximation (max abs error
    1.5e-7 — below bf16/fp32-activation resolution). Mosaic implements
    neither erf nor erfc, but exp it has."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x, exact):
    """GELU lowerable in Pallas ('exact' = erf-form GELU via the A&S
    polynomial; False = the standard tanh approximation)."""
    if exact:
        return 0.5 * x * (1.0 + _erf_poly(x * (2.0 ** -0.5)))
    c = (2.0 / jnp.pi) ** 0.5
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x ** 3)))


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, acc, *,
                gelu_exact):
    """Grid (row_tiles, h_blocks); h innermost. x: (tk, C); w1: (C, hb);
    w2: (hb, C); acc: fp32 (tk, C) scratch accumulated across h blocks."""
    hb_idx = pl.program_id(1)
    n_hb = pl.num_programs(1)

    x = x_ref[:]
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)
    h = _gelu(h, gelu_exact)
    part = jnp.dot(h.astype(x.dtype), w2_ref[:],
                   preferred_element_type=jnp.float32)

    @pl.when(hb_idx == 0)
    def _():
        acc[:] = part + b2_ref[0].astype(jnp.float32)

    @pl.when(hb_idx > 0)
    def _():
        acc[:] = acc[:] + part

    @pl.when(hb_idx == n_hb - 1)
    def _():
        out_ref[:] = acc[:].astype(out_ref.dtype)


def mlp_ref(x, w1, b1, w2, b2, gelu_exact=True):
    """XLA reference (and backward math). Matmul inputs stay in x.dtype
    with fp32 accumulation — exactly the kernel's numerics, and (being the
    custom-VJP backward math) it keeps the training backward on bf16 MXU
    throughput: the fp32-upcast form measured its wgrad fusions at ~30%
    MFU in the stage-1 train trace (fp32 runs the MXU at half rate). The
    reference trains under torch.cuda.amp, so bf16 backward matmuls are
    also the parity-faithful choice (`seg18/train_swin.py:5-6,160-173`)."""
    h = jnp.dot(x, w1.astype(x.dtype), preferred_element_type=jnp.float32)
    h = h + b1.astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=not gelu_exact)
    out = jnp.dot(h.astype(x.dtype), w2.astype(x.dtype),
                  preferred_element_type=jnp.float32)
    out = out + b2.astype(jnp.float32)
    return out.astype(x.dtype)


def _pick_h_block(hidden: int, C: int, isz: int) -> int:
    """Pick the hidden-dim block. Preference: the WHOLE hidden dim in one
    block — with a single h iteration the weight blocks have constant index
    maps (fetched once, single-buffered) and the fp32 accumulator never
    round-trips VMEM between grid steps (trace-measured win at stage-1
    size). Otherwise weight blocks stream double-buffered: keep their total
    under ~8MB of the 16MB VMEM (dtype-aware)."""
    if 2 * isz * C * hidden <= 10 * 1024 * 1024:
        return hidden
    budget = 8 * 1024 * 1024
    for hb in (2048, 1024, 512, 256, 128):
        if hidden % hb == 0 and 2 * 2 * isz * C * hb <= budget:
            return hb
    return 128


def _pick_row_tile(rows: int, C: int, hb: int, isz: int) -> int:
    """x/out tiles (x2 buffers) + fp32 hidden + fp32 accumulator within the
    remaining ~6MB."""
    budget = 6 * 1024 * 1024
    per_row = 4 * C * isz + hb * 4 + C * 4  # x/out pairs + h + acc
    for tk in (512, 256, 128, 64, 32, 16, 8):
        if rows % tk == 0 and tk * per_row <= budget:
            return tk
    return 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_mlp(x, w1, b1, w2, b2, gelu_exact=True, interpret=False):
    """GELU MLP over the last axis of x (any leading shape)."""
    *lead, C = x.shape
    x2d = x.reshape(-1, C)
    R = x2d.shape[0]
    hidden = w1.shape[1]
    isz = jnp.dtype(x.dtype).itemsize
    hb = _pick_h_block(hidden, C, isz)
    tk = _pick_row_tile(R, C, hb, isz)

    out = pl.pallas_call(
        functools.partial(_mlp_kernel, gelu_exact=gelu_exact),
        grid=(R // tk, hidden // hb),
        in_specs=[
            pl.BlockSpec((tk, C), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, C), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tk, C), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((tk, C), jnp.float32)],
        interpret=interpret,
    )(x2d, w1.astype(x.dtype), b1[None].astype(jnp.float32),
      w2.astype(x.dtype), b2[None].astype(jnp.float32))
    return out.reshape(*lead, C)


def _fmlp_fwd(x, w1, b1, w2, b2, gelu_exact, interpret):
    out = fused_mlp(x, w1, b1, w2, b2, gelu_exact, interpret)
    return out, (x, w1, b1, w2, b2)


def _fmlp_bwd(gelu_exact, interpret, res, g):
    x, w1, b1, w2, b2 = res
    *lead, C = x.shape
    x2d = x.reshape(-1, C)
    g2d = g.reshape(-1, C)
    _, vjp = jax.vjp(
        lambda x_, w1_, b1_, w2_, b2_: mlp_ref(x_, w1_, b1_, w2_, b2_,
                                               gelu_exact),
        x2d, w1, b1, w2, b2)
    dx, dw1, db1, dw2, db2 = vjp(g2d)
    return (dx.reshape(x.shape).astype(x.dtype), dw1.astype(w1.dtype),
            db1.astype(b1.dtype), dw2.astype(w2.dtype), db2.astype(b2.dtype))


fused_mlp.defvjp(_fmlp_fwd, _fmlp_bwd)
