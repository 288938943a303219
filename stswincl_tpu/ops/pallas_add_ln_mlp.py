"""Fused residual-add + LayerNorm + MLP — Pallas TPU kernel.

Merges `pallas_add_layernorm.fused_add_layer_norm` (the block's first
add+norm) into `pallas_mlp.fused_mlp`'s prologue: the swin block computes

    x_sum  = shortcut + attn_out
    mlp_in = norm2(x_sum)
    out    = mlp(mlp_in)                       (fc1 -> GELU -> fc2)

As two kernels, `mlp_in` makes a full HBM round trip (one write + one read
of a (tokens, C) tensor per block — ~42 MB/block at stage-1 size, ~0.6 ms
per clip across the 12 blocks). Here the normalized activations are
computed once into VMEM scratch on the first hidden-block iteration and
reused across the hidden-dim grid, so `mlp_in` never exists in HBM.

Outputs (x_sum, mlp_out): the caller still needs x_sum as the next
residual shortcut (reference norm order, `swin_512.py:234-235`).

Differentiable via custom_vjp (backward = jax.vjp of the XLA reference,
same pattern as the constituent kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stswincl_tpu.ops.pallas_mlp import _gelu, mlp_ref, _pick_h_block
from stswincl_tpu.ops.pallas_add_layernorm import _ln_math


def _kernel(x_ref, y_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref,
            b2_ref, sum_ref, out_ref, xn, acc, *, eps, gelu_exact):
    """Grid (row_tiles, h_blocks), h innermost. On the first h block the
    row tile's sum + LayerNorm are computed and cached in VMEM (`xn`);
    every h block then contributes its fc2 partial into `acc`."""
    hb_idx = pl.program_id(1)
    n_hb = pl.num_programs(1)

    @pl.when(hb_idx == 0)
    def _():
        s32 = x_ref[:].astype(jnp.float32) + y_ref[:].astype(jnp.float32)
        sum_ref[:] = s32.astype(sum_ref.dtype)
        mu = jnp.mean(s32, axis=-1, keepdims=True)
        xc = s32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        n = xc * jax.lax.rsqrt(var + eps)
        n = n * scale_ref[0].astype(jnp.float32) \
            + bias_ref[0].astype(jnp.float32)
        xn[:] = n.astype(xn.dtype)

    h = jnp.dot(xn[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)
    h = _gelu(h, gelu_exact)
    part = jnp.dot(h.astype(xn.dtype), w2_ref[:],
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


def _pick_row_tile(rows: int, C: int, hb: int, isz: int) -> int:
    """x/y/sum/out tiles (x2 pipeline buffers) + xn + fp32 hidden + acc
    within ~6MB (weights take up to ~8MB, headroom below 16)."""
    budget = 6 * 1024 * 1024
    per_row = 8 * C * isz + C * isz + hb * 4 + C * 4
    for tk in (512, 256, 128, 64, 32, 16, 8):
        if rows % tk == 0 and tk * per_row <= budget:
            return tk
    return 8


def add_ln_mlp_ref(x, y, scale, bias, w1, b1, w2, b2, gelu_exact=True,
                   eps=1e-5):
    """XLA reference (and backward math): (x+y, mlp(LN(x+y)))."""
    s32 = x.astype(jnp.float32) + y.astype(jnp.float32)
    n = _ln_math(s32, scale, bias, eps).astype(x.dtype)
    return s32.astype(x.dtype), mlp_ref(n, w1, b1, w2, b2, gelu_exact)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_add_ln_mlp(x, y, scale, bias, w1, b1, w2, b2, gelu_exact=True,
                     eps=1e-5, interpret=False):
    """(x + y, mlp(LayerNorm(x + y))) with the normalized activations kept
    in VMEM. x/y: (..., C); returns (sum, mlp_out) of the same shape."""
    *lead, C = x.shape
    x2d = x.reshape(-1, C)
    y2d = y.reshape(-1, C)
    R = x2d.shape[0]
    hidden = w1.shape[1]
    isz = jnp.dtype(x.dtype).itemsize
    hb = _pick_h_block(hidden, C, isz)
    tk = _pick_row_tile(R, C, hb, isz)

    row_spec = pl.BlockSpec((tk, C), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_c = pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    s, out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, gelu_exact=gelu_exact),
        grid=(R // tk, hidden // hb),
        in_specs=[
            row_spec, row_spec, vec_c, vec_c,
            pl.BlockSpec((C, hb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, C), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            vec_c,
        ],
        out_specs=(row_spec, row_spec),
        out_shape=(jax.ShapeDtypeStruct(x2d.shape, x.dtype),
                   jax.ShapeDtypeStruct(x2d.shape, x.dtype)),
        scratch_shapes=[pltpu.VMEM((tk, C), x.dtype),
                        pltpu.VMEM((tk, C), jnp.float32)],
        interpret=interpret,
    )(x2d, y2d, scale[None].astype(jnp.float32),
      bias[None].astype(jnp.float32), w1.astype(x.dtype),
      b1[None].astype(jnp.float32), w2.astype(x.dtype),
      b2[None].astype(jnp.float32))
    return s.reshape(*lead, C), out.reshape(*lead, C)


def _fwd(x, y, scale, bias, w1, b1, w2, b2, gelu_exact, eps, interpret):
    out = fused_add_ln_mlp(x, y, scale, bias, w1, b1, w2, b2, gelu_exact,
                           eps, interpret)
    return out, (x, y, scale, bias, w1, b1, w2, b2)


def _bwd(gelu_exact, eps, interpret, res, g):
    x, y, scale, bias, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda x_, y_, s_, b_, w1_, b1_, w2_, b2_: add_ln_mlp_ref(
            x_, y_, s_, b_, w1_, b1_, w2_, b2_, gelu_exact, eps),
        x, y, scale, bias, w1, b1, w2, b2)
    grads = vjp(g)
    return tuple(gr.astype(r.dtype) for gr, r in
                 zip(grads, (x, y, scale, bias, w1, b1, w2, b2)))


fused_add_ln_mlp.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# whole-epilogue kernel: LN1(sum + mlp(LN2(sum))), sum = shortcut + attn
# ---------------------------------------------------------------------------

def _epilogue_kernel(x_ref, y_ref, s2_ref, b2_ref, w1_ref, b1_ref, w2_ref,
                     bw2_ref, s1_ref, b1n_ref, out_ref, xn, sum32, acc, *,
                     eps, gelu_exact):
    """Grid (row_tiles, h_blocks), h innermost. The residual sum lives only
    in fp32 VMEM scratch; the final add+norm1 happens in-register on the
    last h block, so the ONLY HBM tensors are the two inputs and the block
    output (the two-kernel form round-tripped sum and mlp_out: measured
    ~220 GB/s per Pallas elementwise pass makes every extra pass ~2x the
    cost XLA fusion would pay)."""
    hb_idx = pl.program_id(1)
    n_hb = pl.num_programs(1)

    @pl.when(hb_idx == 0)
    def _():
        s32 = x_ref[:].astype(jnp.float32) + y_ref[:].astype(jnp.float32)
        sum32[:] = s32
        mu = jnp.mean(s32, axis=-1, keepdims=True)
        xc = s32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        n = xc * jax.lax.rsqrt(var + eps)
        n = n * s2_ref[0].astype(jnp.float32) + b2_ref[0].astype(jnp.float32)
        xn[:] = n.astype(xn.dtype)

    h = jnp.dot(xn[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)
    h = _gelu(h, gelu_exact)
    part = jnp.dot(h.astype(xn.dtype), w2_ref[:],
                   preferred_element_type=jnp.float32)

    @pl.when(hb_idx == 0)
    def _():
        acc[:] = part + bw2_ref[0].astype(jnp.float32)

    @pl.when(hb_idx > 0)
    def _():
        acc[:] = acc[:] + part

    @pl.when(hb_idx == n_hb - 1)
    def _():
        s32 = sum32[:] + acc[:]
        mu = jnp.mean(s32, axis=-1, keepdims=True)
        xc = s32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        n = xc * jax.lax.rsqrt(var + eps)
        n = n * s1_ref[0].astype(jnp.float32) + b1n_ref[0].astype(jnp.float32)
        out_ref[:] = n.astype(out_ref.dtype)


# (C, hidden) configs verified on-device to compile AND run faster at the
# generous VMEM budget (tools + /tmp sweep); anything else gets the
# conservative budget the static accounting actually justifies, so an
# unswept shape (e.g. non-default swin_dim) can't pick a row tile that
# fails Mosaic VMEM allocation at compile time
_SWEPT_EPI_CONFIGS = frozenset({(512, 2048), (1024, 4096)})


def _pick_row_tile_epi(rows: int, C: int, hb: int, isz: int,
                       w_bytes: int, hidden: int | None = None) -> int:
    """x/y/out tiles (x2 pipeline buffers) + xn + fp32 sum + hidden + acc,
    sized against the VMEM left after the (possibly resident) weights —
    bigger row tiles mean bigger-M matmuls. Swept on v5e (tools + /tmp
    sweep): stage-1 (C=512, hb=2048) tk=512 runs 18% faster than tk=256;
    stage-2 (C=1024, hb=1024) tk=256 5% faster than 128 — both verified to
    compile at the generous budget (the static accounting overestimates the
    true live set; measured configs admit more)."""
    if hidden is not None and (C, hidden) in _SWEPT_EPI_CONFIGS:
        budget = 15 * 1024 * 1024 + 512 * 1024 - w_bytes
    else:
        budget = 11 * 1024 * 1024 - w_bytes
    per_row = 6 * C * isz + C * isz + C * 4 + hb * 4 + C * 4
    for tk in (1024, 512, 256, 128, 64, 32, 16, 8):
        if rows % tk == 0 and tk * per_row <= budget:
            return tk
    return 8


def swin_block_epilogue_ref(x, y, s2, b2, w1, b1, w2, bw2, s1, b1n,
                            gelu_exact=True, eps=1e-5):
    """XLA reference (and backward math): LN1(sum + mlp(LN2(sum))).

    Matches the reference block tail (`swin_512.py:234-235`):
        x = shortcut + attn_out
        x = norm1(x + mlp(norm2(x)))
    with the sum kept in fp32 (the bf16 model path rounds it once; the
    fused kernel's extra precision is strictly closer to the fp32 math).
    """
    s32 = x.astype(jnp.float32) + y.astype(jnp.float32)
    n2 = _ln_math(s32, s2, b2, eps).astype(x.dtype)
    m = mlp_ref(n2, w1, b1, w2, bw2, gelu_exact)
    out32 = s32 + m.astype(jnp.float32)
    return _ln_math(out32, s1, b1n, eps).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def fused_swin_block_epilogue(x, y, s2, b2, w1, b1, w2, bw2, s1, b1n,
                              gelu_exact=True, eps=1e-5, interpret=False):
    """The swin block's full post-attention tail in ONE kernel:
    out = LN1((x + y) + mlp(LN2(x + y))). x/y: (..., C)."""
    *lead, C = x.shape
    x2d = x.reshape(-1, C)
    y2d = y.reshape(-1, C)
    R = x2d.shape[0]
    hidden = w1.shape[1]
    isz = jnp.dtype(x.dtype).itemsize
    hb = _pick_h_block(hidden, C, isz)
    # weight VMEM: single-buffered when resident (hb == hidden), else
    # streamed double-buffered
    w_bytes = (1 if hb == hidden else 2) * 2 * C * hb * isz
    tk = _pick_row_tile_epi(R, C, hb, isz, w_bytes, hidden)

    row_spec = pl.BlockSpec((tk, C), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_c = pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_epilogue_kernel, eps=eps, gelu_exact=gelu_exact),
        grid=(R // tk, hidden // hb),
        in_specs=[
            row_spec, row_spec, vec_c, vec_c,
            pl.BlockSpec((C, hb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, C), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            vec_c, vec_c, vec_c,
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((tk, C), x.dtype),
                        pltpu.VMEM((tk, C), jnp.float32),
                        pltpu.VMEM((tk, C), jnp.float32)],
        interpret=interpret,
    )(x2d, y2d, s2[None].astype(jnp.float32), b2[None].astype(jnp.float32),
      w1.astype(x.dtype), b1[None].astype(jnp.float32), w2.astype(x.dtype),
      bw2[None].astype(jnp.float32), s1[None].astype(jnp.float32),
      b1n[None].astype(jnp.float32))
    return out.reshape(*lead, C)


def _epi_shifted_kernel(x_ref, y_ref, yprev_ref, s2_ref, b2_ref, w1_ref,
                        b1_ref, w2_ref, bw2_ref, s1_ref, b1n_ref, out_ref,
                        xn, sum32, acc, *, eps, gelu_exact, shift, ws):
    """Image-aware epilogue: grid (B, nH, h_blocks), h innermost. Identical
    math to `_epilogue_kernel`, but `y` (the SW attention output, which
    `fused_swin_block_attention(shift>0)` leaves in SHIFTED layout) is read
    back with the INVERSE cyclic shift assembled in VMEM: the last `shift`
    H rows of shifted band (i-1) mod nH (`yprev_ref`) + the first
    ws - shift rows of band i, rotated by +shift along W. The residual sum,
    LN, and MLP then run on matching unshifted coordinates and the output
    is written unshifted — the inverse `jnp.roll` never exists in HBM.

    x_ref/out_ref: (1, T, ws, W, C) unshifted band i; y_ref: shifted band
    i; yprev_ref: shifted band (i-1) mod nH.
    """
    hb_idx = pl.program_id(2)
    n_hb = pl.num_programs(2)
    _, T, _, Wd, C = x_ref.shape
    rows = T * ws * Wd

    @pl.when(hb_idx == 0)
    def _():
        band = jnp.concatenate(
            [yprev_ref[0, :, ws - shift:], y_ref[0, :, :ws - shift]], axis=1)
        band = jnp.concatenate(
            [band[:, :, Wd - shift:], band[:, :, :Wd - shift]], axis=2)
        s32 = (x_ref[0].astype(jnp.float32)
               + band.astype(jnp.float32)).reshape(rows, C)
        sum32[:] = s32
        mu = jnp.mean(s32, axis=-1, keepdims=True)
        xc = s32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        n = xc * jax.lax.rsqrt(var + eps)
        n = n * s2_ref[0].astype(jnp.float32) + b2_ref[0].astype(jnp.float32)
        xn[:] = n.astype(xn.dtype)

    h = jnp.dot(xn[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)
    h = _gelu(h, gelu_exact)
    part = jnp.dot(h.astype(xn.dtype), w2_ref[:],
                   preferred_element_type=jnp.float32)

    @pl.when(hb_idx == 0)
    def _():
        acc[:] = part + bw2_ref[0].astype(jnp.float32)

    @pl.when(hb_idx > 0)
    def _():
        acc[:] = acc[:] + part

    @pl.when(hb_idx == n_hb - 1)
    def _():
        s32 = sum32[:] + acc[:]
        mu = jnp.mean(s32, axis=-1, keepdims=True)
        xc = s32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        n = xc * jax.lax.rsqrt(var + eps)
        n = n * s1_ref[0].astype(jnp.float32) + b1n_ref[0].astype(jnp.float32)
        out_ref[0] = n.astype(out_ref.dtype).reshape(T, ws, Wd, C)


def swin_block_epilogue_shifted_ref(x, y_shifted, s2, b2, w1, b1, w2, bw2,
                                    s1, b1n, shift, gelu_exact=True,
                                    eps=1e-5):
    """XLA reference (and backward math): un-shift y, then the epilogue.
    x, y_shifted: (B, T, H, W, C)."""
    y = jnp.roll(y_shifted, (shift, shift), axis=(2, 3))
    return swin_block_epilogue_ref(x, y, s2, b2, w1, b1, w2, bw2, s1, b1n,
                                   gelu_exact, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def fused_swin_block_epilogue_shifted(x, y_shifted, s2, b2, w1, b1, w2, bw2,
                                      s1, b1n, shift, ws, gelu_exact=True,
                                      eps=1e-5, interpret=False):
    """The SW block's full post-attention tail in ONE kernel, consuming the
    attention output in SHIFTED layout and producing the unshifted result:
    out = LN1((x + unshift(y)) + mlp(LN2(x + unshift(y)))).

    x, y_shifted: (B, T, H, W, C). Pairs with
    `fused_swin_block_attention(shift>0)` so neither roll touches HBM.
    """
    B, T, H, W, C = x.shape
    nH = H // ws
    hidden = w1.shape[1]
    isz = jnp.dtype(x.dtype).itemsize
    hb = _pick_h_block(hidden, C, isz)

    const3 = lambda b, i, j: (0, 0)
    band = pl.BlockSpec((1, T, ws, W, C), lambda b, i, j: (b, 0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    prev = pl.BlockSpec((1, T, ws, W, C),
                        lambda b, i, j: (b, 0, (i + nH - 1) % nH, 0, 0),
                        memory_space=pltpu.VMEM)
    vec_c = pl.BlockSpec((1, C), const3, memory_space=pltpu.VMEM)
    rows = T * ws * W
    out = pl.pallas_call(
        functools.partial(_epi_shifted_kernel, eps=eps,
                          gelu_exact=gelu_exact, shift=shift, ws=ws),
        grid=(B, nH, hidden // hb),
        in_specs=[
            band, band, prev, vec_c, vec_c,
            pl.BlockSpec((C, hb), lambda b, i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb), lambda b, i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, C), lambda b, i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            vec_c, vec_c, vec_c,
        ],
        out_specs=band,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((rows, C), x.dtype),
                        pltpu.VMEM((rows, C), jnp.float32),
                        pltpu.VMEM((rows, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(x, y_shifted, y_shifted, s2[None].astype(jnp.float32),
      b2[None].astype(jnp.float32), w1.astype(x.dtype),
      b1[None].astype(jnp.float32), w2.astype(x.dtype),
      bw2[None].astype(jnp.float32), s1[None].astype(jnp.float32),
      b1n[None].astype(jnp.float32))
    return out


def _epis_fwd(x, y_shifted, s2, b2, w1, b1, w2, bw2, s1, b1n, shift, ws,
              gelu_exact, eps, interpret):
    out = fused_swin_block_epilogue_shifted(
        x, y_shifted, s2, b2, w1, b1, w2, bw2, s1, b1n, shift, ws,
        gelu_exact, eps, interpret)
    return out, (x, y_shifted, s2, b2, w1, b1, w2, bw2, s1, b1n)


def _epis_bwd(shift, ws, gelu_exact, eps, interpret, res, g):
    args = res
    _, vjp = jax.vjp(
        lambda *a: swin_block_epilogue_shifted_ref(
            *a, shift, gelu_exact, eps), *args)
    grads = vjp(g)
    return tuple(gr.astype(r.dtype) for gr, r in zip(grads, args))


fused_swin_block_epilogue_shifted.defvjp(_epis_fwd, _epis_bwd)


def _epi_fwd(x, y, s2, b2, w1, b1, w2, bw2, s1, b1n, gelu_exact, eps,
             interpret):
    out = fused_swin_block_epilogue(x, y, s2, b2, w1, b1, w2, bw2, s1, b1n,
                                    gelu_exact, eps, interpret)
    return out, (x, y, s2, b2, w1, b1, w2, bw2, s1, b1n)


def _epi_bwd(gelu_exact, eps, interpret, res, g):
    args = res
    _, vjp = jax.vjp(
        lambda *a: swin_block_epilogue_ref(*a, gelu_exact, eps), *args)
    grads = vjp(g)
    return tuple(gr.astype(r.dtype) for gr, r in zip(grads, args))


fused_swin_block_epilogue.defvjp(_epi_fwd, _epi_bwd)
