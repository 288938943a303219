"""Image-layout fused window attention — the north-star Pallas kernel.

Fuses the (window partition -> per-head joint space-time attention with
relative bias + SW-MSA mask -> window reverse) pipeline of each swin block
into ONE kernel operating directly on the image-layout qkv tensor
(B, T, H, W, 3C). The qkv/proj projections stay in XLA (they already run
near MXU peak); what this kernel removes is everything between them:

  * the window partition / regroup / reverse transposes (materialized
    reshapes, ~1.5 ms/forward in the einsum path's device trace),
  * the (Bw, heads, TN, TN) fp32 score tensor and its softmax round trips
    through HBM (the convert_reduce traffic),
  * per-window bias/mask re-reads (constant-index blocks stay resident).

Each grid cell (b, i, j) reads one (T, ws, ws, 3C) window tile — which IS
the window across all T frames, so partitioning is just the BlockSpec —
loops over heads computing fp32 scores/softmax in VMEM, and writes the
(T, ws, ws, C) attention output back in image layout (window reverse for
free). Cyclic shifts stay outside (one cheap roll each way).

Differentiable via custom_vjp: backward = `jax.vjp` of the XLA reference
implementation (exact same math, recompute-style).

Negative result (r3, measured on v5e): stacking the per-window heads into
one block-diagonal attention (Q/K/V stacked to (heads*TN, hd), combined
bias+mask+(-1e9 off-diagonal) precomputed host-side, 2 big matmuls instead
of 3*heads small ones) is SLOWER — 4.67 vs 3.84 ms at the stage-1
two-group shape, 3.40 vs 3.34 at stage-2 — the 4x score/pv FLOP waste of
the off-diagonal blocks outweighs any dispatch savings; Mosaic already
pipelines the (TN, hd)-sized matmuls well. The per-head loop stays.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_kernel(qkv_ref, bias_ref, mask_ref, out_ref, *, heads, scale, ws,
                single_mask):
    """One grid cell = one ROW of windows (mosaic tiling requires the
    block's last two dims %8/%128-aligned, which rules out bare (ws, ws)
    tiles at ws=4 — and row cells amortize dispatch anyway).

    qkv_ref: (1, T, ws, W, 3C); bias_ref: (heads, TN, TN);
    mask_ref: (nW, TN, TN) masks of this row's windows (or (1,..) zeros);
    out_ref: (1, T, ws, W, C).
    """
    _, T, _, Wd, C3 = qkv_ref.shape
    C = C3 // 3
    hd = C // heads
    nW = Wd // ws
    TN = T * ws * ws

    row = qkv_ref[0]  # (T, ws, W, 3C)
    for j in range(nW):
        win = row[:, :, j * ws:(j + 1) * ws, :].reshape(TN, C3)
        outs = []
        for h in range(heads):
            # q/k stay in the input dtype: bf16 MXU inputs with fp32
            # accumulation — the einsum model path's exact semantics
            # (ops/attention.py) and the fast MXU path (an fp32 dot
            # runs multi-pass on the MXU). Scale lands on the fp32 score
            # accumulator (not the bf16 q), the single-entry mask is the
            # W-MSA zero mask by contract so its add is skipped, and the
            # softmax divide is one reciprocal per ROW — together the
            # measured VPU-bound tail of this kernel.
            q = win[:, h * hd:(h + 1) * hd]
            k = win[:, C + h * hd:C + (h + 1) * hd]
            v = win[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
            scores = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            scores = scores * jnp.float32(scale) + bias_ref[h].astype(
                jnp.float32)
            if not single_mask:
                scores = scores + mask_ref[j].astype(jnp.float32)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            outs.append(o.astype(out_ref.dtype))
        out = jnp.concatenate(outs, axis=-1).reshape(T, ws, ws, C)
        out_ref[0, :, :, j * ws:(j + 1) * ws, :] = out


def windowed_attention_image_ref(qkv, bias_tiled, mask_tiled, heads, scale,
                                 ws):
    """XLA reference with identical semantics (also the backward math)."""
    B, T, H, W, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    nH, nW = H // ws, W // ws
    TN = T * ws * ws
    # partition: (B, nH, nW, T, ws, ws, 3C) -> (B*nWin, T*N, 3C)
    xw = qkv.reshape(B, T, nH, ws, nW, ws, C3)
    xw = xw.transpose(0, 2, 4, 1, 3, 5, 6).reshape(B * nH * nW, TN, C3)
    q = xw[..., :C].reshape(-1, TN, heads, hd).transpose(0, 2, 1, 3)
    k = xw[..., C:2 * C].reshape(-1, TN, heads, hd).transpose(0, 2, 1, 3)
    v = xw[..., 2 * C:].reshape(-1, TN, heads, hd).transpose(0, 2, 1, 3)
    # identical formulation (and rounding) to the kernels: fp32 post-matmul
    # scale, zero-mask add skipped, reciprocal-multiply softmax
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * jnp.float32(scale) + bias_tiled[None].astype(jnp.float32)
    n_mask = mask_tiled.shape[0]
    if n_mask > 1:
        m = mask_tiled.astype(jnp.float32)
        scores = (scores.reshape(B, n_mask, heads, TN, TN)
                  + m[None, :, None]).reshape(-1, heads, TN, TN)
    mx = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - mx)
    p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(qkv.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(B, nH, nW, T, ws, ws, C)
    o = o.transpose(0, 3, 1, 4, 2, 5, 6).reshape(B, T, H, W, C)
    return o


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def windowed_attention_image(qkv, bias_tiled, mask_tiled, heads, scale, ws,
                             interpret=False):
    """Fused partition+attention+reverse on an image-layout qkv tensor.

    Args:
      qkv: (B, T, H, W, 3C), already cyclically shifted if SW-MSA. Feature
        axis ordered [q | k | v], each C channels, heads-major within
        (matching the reference qkv reshape semantics).
      bias_tiled: (heads, TN, TN) relative-position bias (T x T tiled).
      mask_tiled: (nWindows, TN, TN) SW-MSA mask, or (1, TN, TN) ZEROS —
        a single-entry mask is the W-MSA no-mask marker and its (zero)
        add is skipped inside the kernels; passing a nonzero single-entry
        mask is out of contract.
      ws: window size.

    Returns: (B, T, H, W, C) attention output in image layout.
    """
    B, T, H, W, C3 = qkv.shape
    nH, nW = H // ws, W // ws
    TN = T * ws * ws
    n_mask = mask_tiled.shape[0]
    single_mask = n_mask == 1

    if single_mask:
        mask_spec = pl.BlockSpec((1, TN, TN), lambda b, i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        # one block = the nW masks of row i
        mask_spec = pl.BlockSpec((nW, TN, TN), lambda b, i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_row_kernel, heads=heads, scale=scale, ws=ws,
                          single_mask=single_mask),
        grid=(B, nH),
        in_specs=[
            pl.BlockSpec((1, T, ws, W, C3),
                         lambda b, i: (b, 0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, TN, TN), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            mask_spec,
        ],
        out_specs=pl.BlockSpec((1, T, ws, W, C3 // 3),
                               lambda b, i: (b, 0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, H, W, C3 // 3), qkv.dtype),
        interpret=interpret,
    )(qkv, bias_tiled, mask_tiled)


def _full_kernel(x_ref, xnext_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                 bias_ref, mask_ref, out_ref, qkv_scr, *, heads, scale, ws,
                 single_mask, qkv_chunks, shift, band_rows=1):
    """Fully fused swin attention for one row of windows: qkv projection,
    per-window per-head attention, and output projection — weights stay
    VMEM-resident across cells (constant index maps).

    The qkv activations land in an explicit bf16 VMEM scratch, computed in
    `qkv_chunks` row chunks so the fp32 matmul intermediate stays small
    (at C=1024 the whole-row fp32 qkv is ~7.9MB of VMEM value pressure;
    chunking measured ~4% faster on the stage-2 shape, bit-identical).

    `shift` > 0 absorbs the SW-MSA cyclic shift into the kernel: the window
    band is assembled from the UNSHIFTED tensor — the last (ws - shift) H
    rows of band i plus the first `shift` H rows of band (i+1) mod nH
    (delivered as `xnext_ref`, the same array fetched at the successor
    index), then rotated by `shift` along W in VMEM. Replaces the two XLA
    `jnp.roll`s (~2.0 ms per SW block at stage-1 serving shape — the
    4-row-misaligned slice+concat fusions run far below HBM bandwidth)
    with an in-VMEM shuffle measured at ~0.08 ms. The W-axis rotation is
    slice+concat because Mosaic's rotate lowering rejects non-32-bit data.

    `band_rows` > 1 processes that many window ROWS per grid cell (block
    height band_rows*ws): the qkv/proj matmuls get band_rows-x bigger M and
    the per-cell fixed costs amortize; the per-window attention loop simply
    runs band_rows*nW times. Grid cells shrink to (B, nH/band_rows); the
    shift logic is unchanged (shift < ws <= band height).

    x_ref: (1, T, band_rows*ws, W, C); xnext_ref: same (read when
    shift > 0); wqkv: (C, 3C); wproj: (C, C); biases (1, *);
    bias_ref: (heads, TN, TN); mask_ref: (band_rows*nW|1, TN, TN);
    out_ref: (1, T, band_rows*ws, W, C); qkv_scr: (rows, 3C) scratch.
    """
    _, T, BH, Wd, C = x_ref.shape
    hd = C // heads
    nW = Wd // ws
    TN = T * ws * ws
    rows = T * BH * Wd

    if shift:
        band = jnp.concatenate(
            [x_ref[0, :, shift:], xnext_ref[0, :, :shift]], axis=1)
        band = jnp.concatenate(
            [band[:, :, shift:], band[:, :, :shift]], axis=2)
        x = band.reshape(rows, C)
    else:
        x = x_ref[0].reshape(rows, C)
    ck = rows // qkv_chunks
    for i in range(qkv_chunks):
        part = jnp.dot(x[i * ck:(i + 1) * ck], wqkv_ref[:],
                       preferred_element_type=jnp.float32)
        qkv_scr[i * ck:(i + 1) * ck] = (
            part + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)
    qkv = qkv_scr[:].reshape(T, BH, Wd, 3 * C)

    row_outs = []
    for wr in range(band_rows):
        win_outs = []
        for j in range(nW):
            win = qkv[:, wr * ws:(wr + 1) * ws,
                      j * ws:(j + 1) * ws, :].reshape(TN, 3 * C)
            outs = []
            for h in range(heads):
                # q/k stay in the input dtype: bf16 MXU inputs with fp32
                # accumulation — the einsum model path's exact semantics
                # (ops/attention.py) and the fast MXU path (an fp32 dot
                # runs multi-pass on the MXU). Post-matmul fp32 scale,
                # zero-mask add skipped (single-entry mask == W-MSA zeros
                # by contract), reciprocal-multiply softmax: the kernel is
                # VPU-bound at these matmul sizes, so every elementwise
                # pass over the (TN, TN) scores is ~1/6 of its runtime.
                q = win[:, h * hd:(h + 1) * hd]
                k = win[:, C + h * hd:C + (h + 1) * hd]
                v = win[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
                scores = jax.lax.dot_general(
                    q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                scores = scores * jnp.float32(scale) + bias_ref[h].astype(
                    jnp.float32)
                if not single_mask:
                    scores = scores + mask_ref[wr * nW + j].astype(
                        jnp.float32)
                m = jnp.max(scores, axis=-1, keepdims=True)
                e = jnp.exp(scores - m)
                p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
                o = jnp.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32)
                outs.append(o.astype(x.dtype))
            win_outs.append(
                jnp.concatenate(outs, axis=-1).reshape(T, ws, ws, C))
        row_outs.append(jnp.concatenate(win_outs, axis=2))  # (T, ws, W, C)
    attn_row = (row_outs[0] if band_rows == 1
                else jnp.concatenate(row_outs, axis=1))  # (T, BH, W, C)

    flat = attn_row.reshape(rows, C)
    out = jnp.dot(flat, wproj_ref[:], preferred_element_type=jnp.float32)
    out = out + bproj_ref[0].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype).reshape(T, BH, Wd, C)


def fused_swin_block_attention_ref(x, wqkv, bqkv, wproj, bproj, bias_tiled,
                                   mask_tiled, heads, scale, ws, shift=0):
    """XLA reference (and backward math) for the fully fused kernel.

    With shift > 0 the input is unshifted and the reference applies the
    cyclic shift first; the output remains in shifted layout (matching the
    kernel's contract)."""
    if shift:
        x = jnp.roll(x, (-shift, -shift), axis=(2, 3))
    qkv = (jnp.einsum("bthwc,cd->bthwd", x, wqkv.astype(x.dtype),
                      preferred_element_type=jnp.float32)
           + bqkv.astype(jnp.float32)).astype(x.dtype)
    attn = windowed_attention_image_ref(qkv, bias_tiled, mask_tiled, heads,
                                        scale, ws)
    out = (jnp.einsum("bthwc,cd->bthwd", attn, wproj.astype(x.dtype),
                      preferred_element_type=jnp.float32)
           + bproj.astype(jnp.float32)).astype(x.dtype)
    return out


def _resolve_band_rows(band_rows, nH, T, ws, W, C, isz):
    """Window rows per grid cell. None -> the STSWIN_ATTN_BAND_ROWS env
    default (profiling knob). Falls back to 1 when nH isn't divisible or
    the qkv scratch would blow the VMEM budget.

    Default 1 is the MEASURED best config (r5, post fast-erf): end-to-end
    serving bs=16 is 123.0 fps with band 1 vs 122.1 with band 2
    (tools/profile_serving_band.py), and every per-shape kernel delta is
    within ~1% (tools/profile_attn_band.py) — r4's small band-2 serving
    edge did not survive the r5 kernel work. bench.py still A/Bs the knob
    every round as the guardrail that the default stays the winner."""
    if band_rows is None:
        import os
        band_rows = int(os.environ.get("STSWIN_ATTN_BAND_ROWS", "1"))
    if band_rows <= 1 or nH % band_rows:
        return 1
    scratch = T * band_rows * ws * W * 3 * C * isz
    return band_rows if scratch <= 24 * 1024 * 1024 else 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def fused_swin_block_attention(x, wqkv, bqkv, wproj, bproj, bias_tiled,
                               mask_tiled, heads, scale, ws, shift=0,
                               interpret=False, band_rows=None):
    """Whole shifted-window attention sub-block (qkv -> windowed attention
    -> proj) as one Pallas kernel. x: (B, T, H, W, C).

    With shift == 0, x must already be cyclically shifted (or the block is
    unshifted W-MSA). With shift > 0, x is the UNSHIFTED tensor and the
    kernel performs the cyclic shift internally (see `_full_kernel`); the
    OUTPUT stays in shifted layout — pair with
    `pallas_add_ln_mlp.fused_swin_block_epilogue_shifted`, which absorbs
    the inverse shift, so no rolled tensor ever exists in HBM.

    `band_rows` (default: env STSWIN_ATTN_BAND_ROWS, else 1) processes
    several window rows per grid cell — bigger qkv/proj matmul M, fewer
    cells (see `_full_kernel`). Numerics are band-independent (parity
    test: tests/test_pallas_block_attention.py).
    """
    B, T, H, W, C = x.shape
    nH, nW = H // ws, W // ws
    TN = T * ws * ws
    n_mask = mask_tiled.shape[0]
    single_mask = n_mask == 1
    isz = jnp.dtype(x.dtype).itemsize
    br = _resolve_band_rows(band_rows, nH, T, ws, W, C, isz)
    n_cells = nH // br

    if single_mask:
        mask_spec = pl.BlockSpec((1, TN, TN), lambda b, i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        # one block = the br*nW masks of this cell's window rows
        mask_spec = pl.BlockSpec((br * nW, TN, TN), lambda b, i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)

    const = lambda b, i: (0, 0)
    rows = T * br * ws * W
    # chunk the qkv projection when the fp32 whole-row intermediate would
    # be large (stage-2 C=1024: measured ~4% faster; chunks must divide
    # rows and keep M a sublane multiple). The shifted path always chunks:
    # the extra input block + band temporaries need the VMEM back.
    qkv_chunks = (4 if ((C >= 1024 or shift or br > 1) and rows % 4 == 0 and
                        (rows // 4) % 8 == 0) else 1)
    band_spec = pl.BlockSpec((1, T, br * ws, W, C),
                             lambda b, i: (b, 0, i, 0, 0),
                             memory_space=pltpu.VMEM)
    next_spec = pl.BlockSpec(
        (1, T, br * ws, W, C), lambda b, i: (b, 0, (i + 1) % n_cells, 0, 0),
        memory_space=pltpu.VMEM)
    # the un-shifted path never reads xnext: fetch block 0 constantly so it
    # costs one buffer, not a second stream
    if not shift:
        next_spec = pl.BlockSpec((1, T, br * ws, W, C),
                                 lambda b, i: (0, 0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_full_kernel, heads=heads, scale=scale, ws=ws,
                          single_mask=single_mask, qkv_chunks=qkv_chunks,
                          shift=shift, band_rows=br),
        grid=(B, n_cells),
        in_specs=[
            band_spec,
            next_spec,
            pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, TN, TN), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            mask_spec,
        ],
        out_specs=pl.BlockSpec((1, T, br * ws, W, C),
                               lambda b, i: (b, 0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((rows, 3 * C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(64 if br > 1 else 32) * 1024 * 1024)
        if (shift or br > 1) else None,
        interpret=interpret,
    )(x, x, wqkv.astype(x.dtype), bqkv[None].astype(jnp.float32),
      wproj.astype(x.dtype), bproj[None].astype(jnp.float32),
      bias_tiled, mask_tiled)


def _full_bwd_kernel(x_ref, g_ref, wqkv_ref, bqkv_ref, wproj_ref, bias_ref,
                     mask_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
                     dbproj_ref, dbias_ref, qkv_scr, dqkv_scr, attn_scr,
                     dflat_scr, dwqkv_s, dwproj_s, dbias_s, dbqkv_s,
                     dbproj_s, *, heads, scale, ws, single_mask,
                     qkv_chunks):
    """Fused backward of the whole attention sub-block for one window row:
    recompute qkv + per-window/head attention in VMEM, then emit every
    gradient — dx in image layout plus fp32 weight/bias/relative-bias
    accumulators carried across the sequential (B, nH) grid. Replaces the
    XLA vjp of the einsum reference, whose window-partition transposes ran
    as ~1.5 ms layout copies per block in the train trace (~12 of them per
    step at stage-1 serving shape).

    x_ref/g_ref/dx_ref: (1, T, ws, W, C) — x pre-shifted for SW blocks (g
    arrives in the shifted layout the forward emits, so the two line up);
    scratch: qkv/dqkv (T, ws, W, 3C), attn (T, ws, W, C); accumulators
    dwqkv_s (C, 3C), dwproj_s (C, C), dbias_s (heads, TN, TN), dbqkv_s
    (1, 3C), dbproj_s (1, C).
    """
    cell = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    n_cells = pl.num_programs(0) * pl.num_programs(1)
    _, T, _, Wd, C = x_ref.shape
    hd = C // heads
    nW = Wd // ws
    TN = T * ws * ws
    rows = T * ws * Wd

    x = x_ref[0].reshape(rows, C)
    g = g_ref[0].reshape(rows, C)

    # recompute qkv into the 4D scratch, per frame-slab when chunked (the
    # fp32 intermediate stays small; same policy as the forward kernel)
    assert T % qkv_chunks == 0
    tc = T // qkv_chunks
    for i in range(qkv_chunks):
        sl = x_ref[0, i * tc:(i + 1) * tc].reshape(tc * ws * Wd, C)
        part = jnp.dot(sl, wqkv_ref[:], preferred_element_type=jnp.float32)
        part = (part + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)
        qkv_scr[i * tc:(i + 1) * tc] = part.reshape(tc, ws, Wd, 3 * C)

    # d(attn_row) = g @ wproj^T
    dflat_scr[...] = jax.lax.dot_general(
        g, wproj_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype).reshape(
        T, ws, Wd, C)

    dbias_acc = [None] * heads
    for j in range(nW):
        win = qkv_scr[:, :, j * ws:(j + 1) * ws, :].reshape(TN, 3 * C)
        dfw = dflat_scr[:, :, j * ws:(j + 1) * ws, :].reshape(TN, C)
        o_heads, dq_heads, dk_heads, dv_heads = [], [], [], []
        for h in range(heads):
            # native-dtype score inputs, matching the forward kernels
            # (post-matmul fp32 scale, zero-mask skip, reciprocal softmax)
            q = win[:, h * hd:(h + 1) * hd]
            k = win[:, C + h * hd:C + (h + 1) * hd]
            v = win[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
            scores = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            scores = scores * jnp.float32(scale) + bias_ref[h].astype(
                jnp.float32)
            if not single_mask:
                scores = scores + mask_ref[j].astype(jnp.float32)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))

            do = dfw[:, h * hd:(h + 1) * hd]
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            o_heads.append(o.astype(x.dtype))
            dv = jax.lax.dot_general(                    # p^T @ do
                p.astype(x.dtype), do,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(                    # do @ v^T
                do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dsc = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dbias_acc[h] = dsc if dbias_acc[h] is None else dbias_acc[h] + dsc

            dscb = dsc.astype(x.dtype)
            dq = jnp.dot(dscb, k.astype(x.dtype),
                         preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(                    # (dsc^T @ q) * scale
                dscb, q.astype(x.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dq_heads.append(dq.astype(x.dtype))
            dk_heads.append(dk.astype(x.dtype))
            dv_heads.append(dv.astype(x.dtype))
        attn_scr[:, :, j * ws:(j + 1) * ws, :] = jnp.concatenate(
            o_heads, axis=-1).reshape(T, ws, ws, C)
        dqkv_scr[:, :, j * ws:(j + 1) * ws, :] = jnp.concatenate(
            dq_heads + dk_heads + dv_heads, axis=-1).reshape(T, ws, ws,
                                                             3 * C)

    dqkv_flat = dqkv_scr[...].reshape(rows, 3 * C)
    dx = jax.lax.dot_general(                            # dqkv @ wqkv^T
        dqkv_flat, wqkv_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype).reshape(T, ws, Wd, C)

    dwqkv_p = jax.lax.dot_general(                       # x^T @ dqkv
        x, dqkv_flat, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwproj_p = jax.lax.dot_general(                      # attn_row^T @ g
        attn_scr[...].reshape(rows, C), g,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbias_p = jnp.stack(dbias_acc)
    dbqkv_p = jnp.sum(dqkv_flat.astype(jnp.float32), axis=0,
                      keepdims=True)
    dbproj_p = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(cell == 0)
    def _():
        dwqkv_s[:, :] = dwqkv_p
        dwproj_s[:, :] = dwproj_p
        dbias_s[:, :, :] = dbias_p
        dbqkv_s[:, :] = dbqkv_p
        dbproj_s[:, :] = dbproj_p

    @pl.when(cell > 0)
    def _():
        dwqkv_s[:, :] = dwqkv_s[:, :] + dwqkv_p
        dwproj_s[:, :] = dwproj_s[:, :] + dwproj_p
        dbias_s[:, :, :] = dbias_s[:, :, :] + dbias_p
        dbqkv_s[:, :] = dbqkv_s[:, :] + dbqkv_p
        dbproj_s[:, :] = dbproj_s[:, :] + dbproj_p

    @pl.when(cell == n_cells - 1)
    def _():
        dwqkv_ref[:, :] = dwqkv_s[:, :]
        dwproj_ref[:, :] = dwproj_s[:, :]
        dbias_ref[:, :, :] = dbias_s[:, :, :]
        dbqkv_ref[:, :] = dbqkv_s[:, :]
        dbproj_ref[:, :] = dbproj_s[:, :]


def fused_swin_block_attention_bwd(x, wqkv, bqkv, wproj, bias_tiled,
                                   mask_tiled, g, heads, scale, ws,
                                   interpret=False):
    """Backward of the fully fused attention sub-block (shift handled by
    the caller: x and g must be in the SAME (shifted) layout). Returns
    (dx, dwqkv, dbqkv, dwproj, dbproj, dbias_tiled) — mask gets no grad
    (it is a constant table upstream)."""
    B, T, H, W, C = x.shape
    nH, nW = H // ws, W // ws
    TN = T * ws * ws
    n_mask = mask_tiled.shape[0]
    single_mask = n_mask == 1

    if single_mask:
        mask_spec = pl.BlockSpec((1, TN, TN), lambda b, i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((nW, TN, TN), lambda b, i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    const = lambda b, i: (0, 0)
    band = pl.BlockSpec((1, T, ws, W, C), lambda b, i: (b, 0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    rows = T * ws * W
    call = pl.pallas_call(
        functools.partial(_full_bwd_kernel, heads=heads, scale=scale, ws=ws,
                          single_mask=single_mask, qkv_chunks=1),
        grid=(B, nH),
        in_specs=[
            band, band,
            pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, TN, TN), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            mask_spec,
        ],
        out_specs=(
            band,
            pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, TN, TN), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),               # dx
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),        # dwqkv
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),        # dbqkv
            jax.ShapeDtypeStruct((C, C), jnp.float32),            # dwproj
            jax.ShapeDtypeStruct((1, C), jnp.float32),            # dbproj
            jax.ShapeDtypeStruct((heads, TN, TN), jnp.float32),   # dbias
        ),
        scratch_shapes=[
            pltpu.VMEM((T, ws, W, 3 * C), x.dtype),   # qkv
            pltpu.VMEM((T, ws, W, 3 * C), x.dtype),   # dqkv
            pltpu.VMEM((T, ws, W, C), x.dtype),       # attn_row
            pltpu.VMEM((T, ws, W, C), x.dtype),       # dflat
            pltpu.VMEM((C, 3 * C), jnp.float32),
            pltpu.VMEM((C, C), jnp.float32),
            pltpu.VMEM((heads, TN, TN), jnp.float32),
            pltpu.VMEM((1, 3 * C), jnp.float32),
            pltpu.VMEM((1, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    # sequential-grid accumulators: vmap must raise, not fault the device
    from stswincl_tpu.ops.vmap_guard import guard_no_vmap
    outs = guard_no_vmap(call, "fused_swin_block_attention_bwd")(
        x, g, wqkv.astype(x.dtype), bqkv[None].astype(jnp.float32),
        wproj.astype(x.dtype), bias_tiled, mask_tiled)
    dx, dwqkv, dbqkv, dwproj, dbproj, dbias = outs
    return dx, dwqkv, dbqkv[0], dwproj, dbproj[0], dbias


def _fsba_fwd(x, wqkv, bqkv, wproj, bproj, bias_tiled, mask_tiled,
              heads, scale, ws, shift, interpret, band_rows):
    out = fused_swin_block_attention(x, wqkv, bqkv, wproj, bproj, bias_tiled,
                                     mask_tiled, heads, scale, ws, shift,
                                     interpret, band_rows)
    return out, (x, wqkv, bqkv, wproj, bproj, bias_tiled, mask_tiled)


def _fsba_bwd(heads, scale, ws, shift, interpret, band_rows, res, g):
    x, wqkv, bqkv, wproj, bproj, bias_tiled, mask_tiled = res
    from stswincl_tpu.ops.pallas_attention import _is_tpu_backend
    if not interpret and _is_tpu_backend():
        # the kernel needs x and g in the same layout: for the roll-free SW
        # path the forward consumed unshifted x and emitted shifted out, so
        # shift x here (one roll) and un-shift dx (a second) — still far
        # cheaper than the einsum vjp's partition transposes
        xs = jnp.roll(x, (-shift, -shift), axis=(2, 3)) if shift else x
        dx, dwqkv, dbqkv, dwproj, dbproj, dbias = \
            fused_swin_block_attention_bwd(
                xs, wqkv, bqkv, wproj, bias_tiled, mask_tiled, g,
                heads, scale, ws)
        if shift:
            dx = jnp.roll(dx, (shift, shift), axis=(2, 3))
        return (dx.astype(x.dtype), dwqkv.astype(wqkv.dtype),
                dbqkv.astype(bqkv.dtype), dwproj.astype(wproj.dtype),
                dbproj.astype(bproj.dtype), dbias.astype(bias_tiled.dtype),
                jnp.zeros_like(mask_tiled))
    _, vjp = jax.vjp(
        lambda a, b, c, d, e, f, m: fused_swin_block_attention_ref(
            a, b, c, d, e, f, m, heads, scale, ws, shift),
        x, wqkv, bqkv, wproj, bproj, bias_tiled, mask_tiled)
    return vjp(g)


fused_swin_block_attention.defvjp(_fsba_fwd, _fsba_bwd)



def _wai_fwd(qkv, bias_tiled, mask_tiled, heads, scale, ws, interpret):
    out = windowed_attention_image(qkv, bias_tiled, mask_tiled, heads, scale,
                                   ws, interpret)
    return out, (qkv, bias_tiled, mask_tiled)


def _wai_bwd(heads, scale, ws, interpret, res, g):
    qkv, bias_tiled, mask_tiled = res
    _, vjp = jax.vjp(
        lambda a, b, c: windowed_attention_image_ref(a, b, c, heads, scale, ws),
        qkv, bias_tiled, mask_tiled)
    return vjp(g)


windowed_attention_image.defvjp(_wai_fwd, _wai_bwd)
