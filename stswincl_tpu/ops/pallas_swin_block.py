"""Whole swin W-MSA block as ONE Pallas kernel — the full-fusion step.

One grid cell computes an entire block row band end to end:

    qkv = x @ Wqkv + bqkv                  (VMEM scratch, never in HBM)
    att = window_attention(qkv)            (per-window fp32 scores in VMEM)
    y   = att @ Wproj + bproj              (rounded to the model dtype)
    s   = x + y                            (fp32)
    out = LN1(s + mlp(LN2(s)))             (reference norm order,
                                            `swin_512.py:234-235`)

Motivation (r3 device trace, bs=8 clip path): the fused attention kernel
(`pallas_block_attention.fused_swin_block_attention`) and the fused
epilogue (`pallas_add_ln_mlp.fused_swin_block_epilogue`) are separate
kernels, so per block the activation tensor touches HBM five times — x is
read by the attention AND re-read as the epilogue's shortcut, and the
attention output makes a full write+read round trip in between. Fusing the
pair makes it two touches (read x once, write out once): at stage-1 serving
shape that removes ~0.5 GB of HBM traffic per block. All weights (qkv +
proj + both LN vectors + both MLP matrices) stay VMEM-resident across grid
cells via constant index maps.

W-MSA (shift == 0) only: the SW-MSA inverse shift needs the NEXT band's
attention rows, which in the two-kernel pairing are fetched from the
attention output in HBM (`fused_swin_block_epilogue_shifted`); in a single
kernel that tensor no longer exists, so SW blocks keep the existing
roll-free pair. Blocks alternate W/SW, so half of every stack routes here.

MEASURED NEGATIVE RESULT (2026-08-19, device, same-session A/B via
`bench.py` with `STSWIN_WHOLE_BLOCK=1` vs `0`): the fusion LOSES ~3-4%
end to end — clip path 81.5 vs 83.9 fps/chip (bs=8), serving 109.8 vs
114.8. The saved HBM round-trips do not pay back: at these shapes the
block is compute-bound (epilogue matmuls ~70% MFU, attention ~51%), and
the two-kernel pairing lets Mosaic double-buffer each kernel's small row
band across its many grid cells, overlapping the activation DMA it still
has with compute. The mega-kernel's per-cell working set (full weight
set + qkv scratch + fp32 intermediates) is several times larger, so
fewer cells run per stack and the serialized qkv->attention->proj->MLP
chain inside one cell exposes its own latency instead. Kept (with
parity + grad tests) as the measured record for why the routing default
is OFF — opt in with `STSWIN_WHOLE_BLOCK=1`.

Semantics envelope: reference `SwinTransformerBlock.forward`
(`/root/reference/seg18/net/Ours/swin_512.py:196-237`), W=MSA case.
Differentiable via custom_vjp: backward = `jax.vjp` of the composition of
the two existing fused ops (recompute-style), so training takes the same
fused backward kernels as the unfused routing and this kernel needs no
backward of its own.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stswincl_tpu.ops.pallas_mlp import _gelu


def _whole_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
                  mask_ref, s2_ref, b2_ref, w1_ref, b1_ref, w2_ref, bw2_ref,
                  s1_ref, b1n_ref, out_ref, qkv_scr, *, heads, scale, ws,
                  single_mask, qkv_chunks, mlp_chunks, gelu_exact, eps):
    """One row band of windows, whole block. x_ref/out_ref:
    (1, T, ws, W, C); qkv_scr: (rows, 3C) model-dtype scratch.

    The MLP epilogue runs in `mlp_chunks` row chunks so the fp32 hidden
    intermediate (rows, hidden) stays a bounded VMEM value; LN and the MLP
    are row-local so chunking is exact.
    """
    _, T, BH, Wd, C = x_ref.shape
    hd = C // heads
    nW = Wd // ws
    TN = T * ws * ws
    rows = T * BH * Wd

    x = x_ref[0].reshape(rows, C)

    # ---- qkv projection into VMEM scratch (chunked: small fp32 value) ----
    ck = rows // qkv_chunks
    for i in range(qkv_chunks):
        part = jnp.dot(x[i * ck:(i + 1) * ck], wqkv_ref[:],
                       preferred_element_type=jnp.float32)
        qkv_scr[i * ck:(i + 1) * ck] = (
            part + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)
    qkv = qkv_scr[:].reshape(T, BH, Wd, 3 * C)

    # ---- per-window, per-head attention (fp32 scores in VMEM) ----
    win_outs = []
    for j in range(nW):
        win = qkv[:, :, j * ws:(j + 1) * ws, :].reshape(TN, 3 * C)
        outs = []
        for h in range(heads):
            # q/k stay in the input dtype: bf16 MXU inputs with fp32
            # accumulation — the einsum model path's exact semantics
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
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            outs.append(o.astype(x.dtype))
        win_outs.append(jnp.concatenate(outs, axis=-1).reshape(T, ws, ws, C))
    attn_row = jnp.concatenate(win_outs, axis=2)  # (T, ws, W, C)
    flat = attn_row.reshape(rows, C)

    # ---- output projection, rounded like the unfused attention kernel ----
    y = jnp.dot(flat, wproj_ref[:], preferred_element_type=jnp.float32)
    y = (y + bproj_ref[0].astype(jnp.float32)).astype(x.dtype)

    # ---- epilogue: LN1(s + mlp(LN2(s))), s = x + y, row-chunked ----
    mk = rows // mlp_chunks
    out_chunks = []
    for i in range(mlp_chunks):
        s32 = (x[i * mk:(i + 1) * mk].astype(jnp.float32)
               + y[i * mk:(i + 1) * mk].astype(jnp.float32))
        mu = jnp.mean(s32, axis=-1, keepdims=True)
        xc = s32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        n = xc * jax.lax.rsqrt(var + eps)
        n = (n * s2_ref[0].astype(jnp.float32)
             + b2_ref[0].astype(jnp.float32)).astype(x.dtype)
        h32 = jnp.dot(n, w1_ref[:], preferred_element_type=jnp.float32)
        h32 = _gelu(h32 + b1_ref[0].astype(jnp.float32), gelu_exact)
        m2 = jnp.dot(h32.astype(x.dtype), w2_ref[:],
                     preferred_element_type=jnp.float32)
        # reference math: the residual add consumes the ROUNDED mlp output
        # (swin_block_epilogue_ref: out32 = s32 + m.astype(f32))
        m2 = (m2 + bw2_ref[0].astype(jnp.float32)).astype(x.dtype)
        o32 = s32 + m2.astype(jnp.float32)
        mu = jnp.mean(o32, axis=-1, keepdims=True)
        xc = o32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        n = xc * jax.lax.rsqrt(var + eps)
        n = (n * s1_ref[0].astype(jnp.float32)
             + b1n_ref[0].astype(jnp.float32))
        out_chunks.append(n.astype(out_ref.dtype))
    out = (out_chunks[0] if mlp_chunks == 1
           else jnp.concatenate(out_chunks, axis=0))
    out_ref[0] = out.reshape(T, BH, Wd, C)


def _pick_chunks(rows: int, width: int, budget_bytes: int) -> int:
    """Smallest chunk count dividing `rows` (chunk still a sublane multiple)
    whose fp32 (chunk, width) intermediate fits `budget_bytes`."""
    for c in (1, 2, 4, 8, 16):
        if rows % c:
            continue
        ck = rows // c
        if ck % 8:
            continue
        if ck * width * 4 <= budget_bytes:
            return c
    return 0


def whole_block_applicable(x_shape, dtype, dim, hidden, ws, shift,
                           out_frame) -> bool:
    """Routing predicate: W-MSA only, TPU dtypes whose resident weight set
    (qkv + proj + mlp) plus the row-band working set fits VMEM, full-frame
    output (the eval `out_frame` elision keeps the unfused pair)."""
    import os
    if os.environ.get("STSWIN_WHOLE_BLOCK", "0") != "1":
        return False
    B, T, H, W, C = x_shape
    if shift or out_frame is not None or C != dim:
        return False
    if H % ws or W % ws:
        return False
    isz = jnp.dtype(dtype).itemsize
    weights = (C * 3 * C + C * C + C * hidden + hidden * C) * isz
    rows = T * ws * W
    if _pick_chunks(rows, hidden, 12 * 1024 * 1024) == 0:
        return False
    # the kernel also asserts a valid qkv chunking at its tighter budget —
    # the gate must imply every kernel precondition (advisor r4)
    if _pick_chunks(rows, 3 * C, 4 * 1024 * 1024) == 0:
        return False
    if rows % 8:
        return False
    # band tiles (x/out, double-buffered) + qkv scratch + fp32 live values
    working = 4 * rows * C * isz + rows * 3 * C * isz + 6 * rows * C * 4
    return weights + working <= 96 * 1024 * 1024


def whole_swin_block_ref(x, wqkv, bqkv, wproj, bproj, bias_tiled, mask_tiled,
                         s2, b2, w1, b1, w2, bw2, s1, b1n, heads, scale, ws,
                         gelu_exact=True, eps=1e-5):
    """XLA reference: composition of the two existing fused-op references."""
    from stswincl_tpu.ops.pallas_block_attention import (
        fused_swin_block_attention_ref)
    from stswincl_tpu.ops.pallas_add_ln_mlp import swin_block_epilogue_ref
    y = fused_swin_block_attention_ref(x, wqkv, bqkv, wproj, bproj,
                                       bias_tiled, mask_tiled, heads, scale,
                                       ws, shift=0)
    return swin_block_epilogue_ref(x, y, s2, b2, w1, b1, w2, bw2, s1, b1n,
                                   gelu_exact, eps)


def _whole_block_fused_pair(x, wqkv, bqkv, wproj, bproj, bias_tiled,
                            mask_tiled, s2, b2, w1, b1, w2, bw2, s1, b1n,
                            heads, scale, ws, gelu_exact, eps):
    """The unfused two-kernel routing (attention + epilogue) — the backward
    path differentiates THIS, so training reuses the existing fused
    backward kernels unchanged."""
    from stswincl_tpu.ops.pallas_block_attention import (
        fused_swin_block_attention)
    from stswincl_tpu.ops.pallas_add_ln_mlp import fused_swin_block_epilogue
    y = fused_swin_block_attention(x, wqkv, bqkv, wproj, bproj, bias_tiled,
                                   mask_tiled, heads, scale, ws, 0)
    return fused_swin_block_epilogue(x, y, s2, b2, w1, b1, w2, bw2, s1, b1n,
                                     gelu_exact, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18, 19, 20))
def fused_whole_swin_block(x, wqkv, bqkv, wproj, bproj, bias_tiled,
                           mask_tiled, s2, b2, w1, b1, w2, bw2, s1, b1n,
                           heads, scale, ws, gelu_exact=True, eps=1e-5,
                           interpret=False):
    """Whole W-MSA swin block in one kernel. x: (B, T, H, W, C) — NOT
    shifted (W-MSA only); returns the block output in the same layout.

    Check `whole_block_applicable` before calling; out-of-envelope shapes
    must route to the two-kernel pair instead.
    """
    B, T, H, W, C = x.shape
    nH, nW = H // ws, W // ws
    TN = T * ws * ws
    hidden = w1.shape[1]
    n_mask = mask_tiled.shape[0]
    single_mask = n_mask == 1
    rows = T * ws * W

    qkv_chunks = _pick_chunks(rows, 3 * C, 4 * 1024 * 1024)
    mlp_chunks = _pick_chunks(rows, hidden, 12 * 1024 * 1024)
    assert qkv_chunks and mlp_chunks, "caller must gate on applicability"

    if single_mask:
        mask_spec = pl.BlockSpec((1, TN, TN), lambda b, i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((nW, TN, TN), lambda b, i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    const = lambda b, i: (0, 0)
    band = pl.BlockSpec((1, T, ws, W, C), lambda b, i: (b, 0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = lambda w: pl.BlockSpec((1, w), const, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_whole_kernel, heads=heads, scale=scale, ws=ws,
                          single_mask=single_mask, qkv_chunks=qkv_chunks,
                          mlp_chunks=mlp_chunks, gelu_exact=gelu_exact,
                          eps=eps),
        grid=(B, nH),
        in_specs=[
            band,
            pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
            vec(3 * C),
            pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
            vec(C),
            pl.BlockSpec((heads, TN, TN), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            mask_spec,
            vec(C), vec(C),
            pl.BlockSpec((C, hidden), const, memory_space=pltpu.VMEM),
            vec(hidden),
            pl.BlockSpec((hidden, C), const, memory_space=pltpu.VMEM),
            vec(C), vec(C), vec(C),
        ],
        out_specs=band,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((rows, 3 * C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, wqkv.astype(x.dtype), bqkv[None].astype(jnp.float32),
      wproj.astype(x.dtype), bproj[None].astype(jnp.float32),
      bias_tiled, mask_tiled, s2[None].astype(jnp.float32),
      b2[None].astype(jnp.float32), w1.astype(x.dtype),
      b1[None].astype(jnp.float32), w2.astype(x.dtype),
      bw2[None].astype(jnp.float32), s1[None].astype(jnp.float32),
      b1n[None].astype(jnp.float32))


def _fwsb_fwd(x, wqkv, bqkv, wproj, bproj, bias_tiled, mask_tiled, s2, b2,
              w1, b1, w2, bw2, s1, b1n, heads, scale, ws, gelu_exact, eps,
              interpret):
    out = fused_whole_swin_block(x, wqkv, bqkv, wproj, bproj, bias_tiled,
                                 mask_tiled, s2, b2, w1, b1, w2, bw2, s1,
                                 b1n, heads, scale, ws, gelu_exact, eps,
                                 interpret)
    return out, (x, wqkv, bqkv, wproj, bproj, bias_tiled, mask_tiled, s2,
                 b2, w1, b1, w2, bw2, s1, b1n)


def _fwsb_bwd(heads, scale, ws, gelu_exact, eps, interpret, res, g):
    args = res
    if interpret:
        fn = lambda *a: whole_swin_block_ref(*a, heads, scale, ws,
                                             gelu_exact, eps)
    else:
        # differentiate the two-kernel composition: its custom_vjps route
        # to the existing fused attention/epilogue backward kernels
        fn = lambda *a: _whole_block_fused_pair(*a, heads, scale, ws,
                                                gelu_exact, eps)
    _, vjp = jax.vjp(fn, *args)
    return vjp(g)


fused_whole_swin_block.defvjp(_fwsb_fwd, _fwsb_bwd)
