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


def _use_fast_erf() -> bool:
    """Trace-time switch for the division/exp-free erf (default ON; set
    STSWIN_FAST_ERF=0 for the A&S form). The GELU runs on ~2.2G hidden
    elements per bs=8 clip batch, and the A&S form costs a VPU divide AND
    an exp per element — the measured reason the epilogue kernels sat at
    ~74% MFU (r5 trace). The polynomial form is pure FMA."""
    import os
    return os.environ.get("STSWIN_FAST_ERF", "1") == "1"


# minimax odd polynomial erf(x) ~ x * P(x^2) on |x| <= 3.0, SATURATED to
# sign(x) beyond (1 - erf(3.0) = 2.2e-5, so the jump is below the fit
# error and GELU's dead negative tail stays exactly dead): measured max
# abs error 2.6e-5 vs true erf including fp32 Horner rounding
# (tests/test_pallas_mlp.py pins the bound) — ~1e-2 of a bf16 ulp of the
# downstream GELU activation. Iteratively-reweighted least-squares fit,
# deg 8 in x^2 on [0, 3].
_ERF_CLAMP = 3.0
_ERF_C = (1.1282684439e+00, -3.7531498256e-01, 1.1107952331e-01,
          -2.5103008059e-02, 4.2354873714e-03, -5.1105060172e-04,
          4.1062300646e-05, -1.9449437556e-06, 4.0745480824e-08)


def _erf_poly_fast(x):
    """erf via the saturated odd minimax polynomial — no divide, no exp.
    The odd form `xc * P(xc^2)` handles the sign for free (and keeps
    jax.grad correct at x == 0, where a sign(x)-based form zeroes it);
    outside the fit range the value saturates to exactly +-1."""
    xc = jnp.clip(x, -_ERF_CLAMP, _ERF_CLAMP)
    t = xc * xc
    p = _ERF_C[-1]
    for c in _ERF_C[-2::-1]:
        p = p * t + c
    return jnp.where(jnp.abs(x) < _ERF_CLAMP, xc * p, jnp.sign(x))


def _erf_poly_fast_grad(x):
    """d/dx of `_erf_poly_fast` (the derivative OF THE APPROXIMATION, so
    hand-written backward kernels match jax.vjp of the refs exactly):
    P(t) + 2 t P'(t) inside the clamp, 0 in the saturated tail."""
    ax = jnp.abs(x)
    t = jnp.minimum(ax, _ERF_CLAMP) ** 2
    p = _ERF_C[-1]
    dp = jnp.float32(0.0)
    for c in _ERF_C[-2::-1]:
        dp = dp * t + p
        p = p * t + c
    return jnp.where(ax < _ERF_CLAMP, p + 2.0 * t * dp, 0.0)


def _erf_poly(x):
    """erf for Pallas kernels (Mosaic implements neither erf nor erfc).

    Default: the clamped minimax polynomial (`_erf_poly_fast`).
    STSWIN_FAST_ERF=0: Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7)
    — accuracy insurance, costs a divide + exp per element."""
    if _use_fast_erf():
        return _erf_poly_fast(x)
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x, exact):
    """GELU lowerable in Pallas ('exact' = erf-form GELU via the in-tree
    erf polynomial; False = the standard tanh approximation)."""
    if exact:
        return 0.5 * x * (1.0 + _erf_poly(x * (2.0 ** -0.5)))
    c = (2.0 / jnp.pi) ** 0.5
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x ** 3)))


def _gelu_and_grad(x, exact):
    """(gelu(x), d gelu(x) / dx) in fp32, sharing ONE erf evaluation.

    The backward kernels need both the recomputed activation and its
    derivative; evaluating them separately runs the erf machinery twice
    per hidden element (for the fast polynomial: two Horner chains on top
    of the dual-recurrence one — the measured ~2% stage-1 train-step tax
    of the fast erf before this fusion). The grad is the derivative OF THE
    ACTIVE APPROXIMATION, so hand-written backwards match jax.vjp of the
    refs to rounding."""
    if not exact:
        c = jnp.float32((2.0 / jnp.pi) ** 0.5)
        inner = c * (x + 0.044715 * x ** 3)
        th = jnp.tanh(inner)
        val = 0.5 * x * (1.0 + th)
        grad = (0.5 * (1.0 + th) + 0.5 * x * (1.0 - th * th) * c
                * (1.0 + 3 * 0.044715 * x * x))
        return val, grad
    s = x * jnp.float32(2.0 ** -0.5)
    if _use_fast_erf():
        sc = jnp.clip(s, -_ERF_CLAMP, _ERF_CLAMP)
        t = sc * sc
        p = _ERF_C[-1]
        dp = jnp.float32(0.0)
        for c in _ERF_C[-2::-1]:
            dp = dp * t + p
            p = p * t + c
        inside = jnp.abs(s) < _ERF_CLAMP
        erf = jnp.where(inside, sc * p, jnp.sign(s))
        derf = jnp.where(inside, p + 2.0 * t * dp, jnp.float32(0.0))
    else:
        a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
        a4, a5, pc = -1.453152027, 1.061405429, 0.3275911
        ax = jnp.abs(s)
        t = 1.0 / (1.0 + pc * ax)
        poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
        ex = jnp.exp(-ax * ax)
        erf = jnp.sign(s) * (1.0 - poly * ex)
        # A&S grad keeps its historical form: the TRUE erf derivative
        # (2/sqrt(pi)) e^{-s^2}, sharing the exp with the value
        derf = jnp.float32(2.0 / jnp.pi ** 0.5) * ex
    phi = 0.5 * (1.0 + erf)
    return 0.5 * x * (1.0 + erf), phi + x * derf * jnp.float32(
        0.5 * 2.0 ** -0.5)


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
    # the ref uses the kernels' OWN `_gelu` (not jax.nn.gelu): the in-kernel
    # erf polynomial is the framework's erf, and the refs define the kernels'
    # exact semantics (incl. the custom-VJP backward math, which must
    # differentiate the same approximation the forward computes)
    h = _gelu(h, gelu_exact)
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
