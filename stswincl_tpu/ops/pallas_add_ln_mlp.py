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

from stswincl_tpu.ops.pallas_mlp import (_gelu, _gelu_and_grad, mlp_ref,
                                         _pick_h_block)
from stswincl_tpu.ops.pallas_add_layernorm import _ln_math
from stswincl_tpu.ops.vmap_guard import guard_no_vmap


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
# fused epilogue BACKWARD kernel (single-h-block configs, e.g. stage 1)
# ---------------------------------------------------------------------------

def _ln_fwd_f32(s32, scale, bias, eps):
    mu = jnp.mean(s32, axis=-1, keepdims=True)
    xc = s32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)
    xhat = xc * rsig
    return xhat * scale + bias, xhat, rsig


def _ln_bwd_f32(g, xhat, rsig, scale):
    """dx for y = xhat*scale + bias (returns fp32; dscale/dbias left to the
    caller as reductions of g*xhat / g)."""
    gs = g * scale
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    return (gs - m1 - xhat * m2) * rsig


def _epi_bwd_kernel(x_ref, y_ref, g_ref, s2_ref, w1_ref, b1_ref, w2_ref,
                    bw2_ref, s1_ref, ds_ref, dw1_ref, db1_ref, dw2_ref,
                    dbw2_ref, ds1_ref, db1n_ref, ds2_ref, db2_ref,
                    dw1_s, dw2_s, vec_s, *, eps, gelu_exact):
    """Backward of `swin_block_epilogue_ref` for one row tile, everything in
    VMEM — the XLA recompute materialized four (rows, hidden) tensors in
    HBM (671 MB each at stage-1 serving shape) through ~230 GB/s loop
    fusions. Weight/vector grads accumulate in fp32 scratch across the
    sequential row-tile grid and are written once on the last tile.

    Outputs: ds (rows, C) — dx == dy == ds; plus the weight/vector grads
    dw1/db1/dw2/dbw2/ds1/db1n/ds2/db2. Vector-grad scratch layout: vec_s is
    (6, max(C, hidden)) fp32 — rows 0-4 hold the C-sized accumulators
    [ds1, db1n, ds2, db2, dbw2] in columns [:C]; row 5 holds the
    hidden-sized db1 in columns [:hidden].
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    C = x_ref.shape[1]
    hidden = w1_ref.shape[1]

    s2 = s2_ref[0].astype(jnp.float32)
    s1 = s1_ref[0].astype(jnp.float32)

    # ---- forward recompute, mirroring swin_block_epilogue_ref's casts ----
    x32 = x_ref[:].astype(jnp.float32)
    s32 = x32 + y_ref[:].astype(jnp.float32)
    n2_32, xhat2, rsig2 = _ln_fwd_f32(s32, s2, s2_ref[1].astype(jnp.float32),
                                      eps)
    n2 = n2_32.astype(x_ref.dtype)
    pre = jnp.dot(n2, w1_ref[:], preferred_element_type=jnp.float32)
    pre = pre + b1_ref[0].astype(jnp.float32)
    h32, dgelu = _gelu_and_grad(pre, gelu_exact)  # one shared erf pass
    h = h32.astype(x_ref.dtype)
    m = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    m = (m + bw2_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
    o32 = s32 + m.astype(jnp.float32)

    mu1 = jnp.mean(o32, axis=-1, keepdims=True)
    xc1 = o32 - mu1
    var1 = jnp.mean(xc1 * xc1, axis=-1, keepdims=True)
    rsig1 = jax.lax.rsqrt(var1 + eps)
    xhat1 = xc1 * rsig1

    # ---- backward ----
    g = g_ref[:].astype(jnp.float32)
    do32 = _ln_bwd_f32(g, xhat1, rsig1, s1)

    dm = do32.astype(x_ref.dtype)
    dh = jax.lax.dot_general(                       # dm @ w2^T
        dm, w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dpre32 = dh * dgelu
    dpre = dpre32.astype(x_ref.dtype)
    dn2 = jax.lax.dot_general(                      # dpre @ w1^T
        dpre, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds_ln2 = _ln_bwd_f32(dn2, xhat2, rsig2, s2)
    ds = do32 + ds_ln2
    ds_ref[:] = ds.astype(ds_ref.dtype)

    dw1_p = jax.lax.dot_general(                    # n2^T @ dpre
        n2, dpre, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw2_p = jax.lax.dot_general(                    # h^T @ dm
        h, dm, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    vec_p = jnp.stack([
        jnp.sum(g * xhat1, axis=0),            # ds1
        jnp.sum(g, axis=0),                    # db1n
        jnp.sum(dn2 * xhat2, axis=0),          # ds2
        jnp.sum(dn2, axis=0),                  # db2
        jnp.sum(do32, axis=0),                 # dbw2
    ])
    db1_p = jnp.sum(dpre32, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw1_s[:, :] = dw1_p
        dw2_s[:, :] = dw2_p
        vec_s[0:5, :C] = vec_p
        vec_s[5:6, :hidden] = db1_p

    @pl.when(i > 0)
    def _():
        dw1_s[:, :] = dw1_s[:, :] + dw1_p
        dw2_s[:, :] = dw2_s[:, :] + dw2_p
        vec_s[0:5, :C] = vec_s[0:5, :C] + vec_p
        vec_s[5:6, :hidden] = vec_s[5:6, :hidden] + db1_p

    @pl.when(i == n - 1)
    def _():
        dw1_ref[:, :] = dw1_s[:, :]
        dw2_ref[:, :] = dw2_s[:, :]
        ds1_ref[0, :] = vec_s[0, :C]
        db1n_ref[0, :] = vec_s[1, :C]
        ds2_ref[0, :] = vec_s[2, :C]
        db2_ref[0, :] = vec_s[3, :C]
        dbw2_ref[0, :] = vec_s[4, :C]
        db1_ref[0, :] = vec_s[5, :hidden]


def _bwd_per_row(C, hidden, isz):
    """Per-row VMEM bytes of `fused_epilogue_bwd`: 4 double-buffered (tk, C)
    streams + fp32 hidden temporaries (pre/dh/dpre + model-dtype h) +
    C-wide fp32 temps."""
    return 4 * C * isz * 2 + 3 * hidden * 4 + hidden * isz + 8 * C * 4


def _bwd_streamed_per_row(C, hb, isz):
    """Per-row VMEM bytes of one `fused_epilogue_bwd_streamed` slice call
    (5 row streams: the extra one is the saved MLP output m)."""
    return 5 * C * isz * 2 + 3 * hb * 4 + hb * isz + 8 * C * 4


def _pick_bwd_row_tile(R, resident, per_row,
                       budget=64 * 1024 * 1024):
    """Largest row tile that divides R and fits the VMEM budget, or None.

    None (no tile in {512..8} divides R — e.g. an odd flattened row count
    from an unusual input shape) means the fused kernels cannot run; the
    routing predicates below return False for such shapes so the epilogue
    backward falls back to the XLA vjp instead of crashing at trace time."""
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if R % cand == 0 and resident + cand * per_row <= budget:
            return cand
    return None


def fused_epilogue_bwd(x, y, s2, b2, w1, b1, w2, bw2, s1, g,
                       gelu_exact=True, eps=1e-5, interpret=False):
    """Fused backward for the whole-epilogue kernel (single-h-block
    configs: the resident-weight case `_pick_h_block` chooses for stage 1).
    x, y, g: (..., C). Returns (ds, ds2, db2, dw1, db1, dw2, dbw2, ds1,
    db1n) with ds = dx = dy in x.dtype and weight grads fp32."""
    *lead, C = x.shape
    x2d = x.reshape(-1, C)
    y2d = y.reshape(-1, C)
    g2d = g.reshape(-1, C)
    R = x2d.shape[0]
    hidden = w1.shape[1]
    isz = jnp.dtype(x.dtype).itemsize

    # row tile sized against the ~110MB VMEM: the resident weights + fp32
    # dw accumulators are fixed (2*C*h*isz + 8*C*h); per-row cost is the
    # 4 double-buffered (tk, C) streams + the fp32 hidden-dim temporaries
    # (pre/dh/dpre + bf16 h) + C-wide fp32 temps. At stage-2 size tk=512
    # measured 108MB on-stack (over the limit); tk=256 fits.
    resident = C * hidden * (2 * isz + 8)
    per_row = _bwd_per_row(C, hidden, isz)
    # Mosaic's actual on-stack allocation runs ~1.5x this static estimate
    # (measured: stage-2 tk=256 estimated 74MB, compiled to 100.85MB), so
    # the budget is set conservatively: stage-1 keeps tk=512 (est 38MB,
    # fits the 100MB limit), stage-2 drops to tk=128.
    tk = _pick_bwd_row_tile(R, resident, per_row)
    if tk is None:
        # routing (_epilogue_bwd_applicable) checks the same pick; reaching
        # here means a caller bypassed it
        raise ValueError(
            f"fused_epilogue_bwd: no row tile divides R={R} "
            f"(C={C}, hidden={hidden}); use the XLA vjp fallback")

    row = pl.BlockSpec((tk, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const = lambda i: (0, 0)
    call = pl.pallas_call(
        functools.partial(_epi_bwd_kernel, eps=eps, gelu_exact=gelu_exact),
        grid=(R // tk,),
        in_specs=[
            row, row, row,
            pl.BlockSpec((2, C), const, memory_space=pltpu.VMEM),   # s2,b2
            pl.BlockSpec((C, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),   # s1
        ],
        out_specs=(
            row,
            pl.BlockSpec((C, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, C), x.dtype),          # ds
            jax.ShapeDtypeStruct((C, hidden), jnp.float32),  # dw1
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),  # db1
            jax.ShapeDtypeStruct((hidden, C), jnp.float32),  # dw2
            jax.ShapeDtypeStruct((1, C), jnp.float32),       # dbw2
            jax.ShapeDtypeStruct((1, C), jnp.float32),       # ds1
            jax.ShapeDtypeStruct((1, C), jnp.float32),       # db1n
            jax.ShapeDtypeStruct((1, C), jnp.float32),       # ds2
            jax.ShapeDtypeStruct((1, C), jnp.float32),       # db2
        ),
        scratch_shapes=[
            pltpu.VMEM((C, hidden), jnp.float32),
            pltpu.VMEM((hidden, C), jnp.float32),
            pltpu.VMEM((6, max(C, hidden)), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    # sequential-grid accumulators: vmap must raise, not fault the device
    outs = guard_no_vmap(call, "fused_epilogue_bwd")(
        x2d, y2d, g2d,
        jnp.stack([s2, b2]).astype(jnp.float32),
        w1.astype(x.dtype), b1[None].astype(jnp.float32),
        w2.astype(x.dtype), bw2[None].astype(jnp.float32),
        s1[None].astype(jnp.float32))
    (ds, dw1, db1, dw2, dbw2, ds1, db1n, ds2, db2) = outs
    return (ds.reshape(*lead, C), ds2[0], db2[0], dw1, db1[0], dw2,
            dbw2[0], ds1[0], db1n[0])


def _epilogue_bwd_applicable(x, w1, dtype):
    """The fused backward keeps the WHOLE hidden dim + both weight-grad
    accumulators VMEM-resident. That fits stage 1 (C=512, h=2048: weights
    2MB + dw scratches 16MB; measured 17.0 vs 29.3 ms for the XLA vjp at
    full-row size). Stage 2 (C=1024, h=4096) does NOT fit in practice:
    weights 16.8MB + 32MB scratches + the two (C, h) fp32 partial-grad
    values put the Mosaic stack at 100.9-106.9MB against the ~100MB scoped
    ceiling in the full train program (standalone it squeaked through) —
    measured, so stage 2 takes the h-SLICED backward instead
    (`fused_epilogue_bwd_streamed`)."""
    from stswincl_tpu.ops.pallas_attention import _is_tpu_backend
    C = x.shape[-1]
    hidden = w1.shape[1]
    isz = jnp.dtype(dtype).itemsize
    resident = C * hidden * (2 * isz + 8)
    R = x.size // C
    tk = _pick_bwd_row_tile(R, resident, _bwd_per_row(C, hidden, isz))
    return (_is_tpu_backend() and resident <= 20 * 1024 * 1024
            and tk is not None)


# ---------------------------------------------------------------------------
# h-SLICED epilogue backward (stage-2 shapes: resident set halved per call)
# ---------------------------------------------------------------------------

def _epi_bwd_slice_kernel(x_ref, y_ref, g_ref, m_ref, s2_ref, s1_ref,
                          w1_ref, b1_ref, w2_ref, dn2_ref, dw1_ref, db1_ref,
                          dw2_ref, dw1_s, dw2_s, db1_s, *, eps, gelu_exact):
    """Backward of ONE hidden slice of the epilogue MLP. Grid (row_tiles,).

    Takes the forward's bf16-rounded MLP output `m` (saved residual) so
    `do32` is computable without the full hidden sweep — this is what
    breaks the all-hidden-resident coupling of `_epi_bwd_kernel`: each
    slice call only holds its own (C, hb)/(hb, C) weights + fp32 grad
    accumulators (~25MB at stage-2 hb=2048 vs ~50MB for the monolith).

    Outputs: dn2 partial (rows, C) fp32 = dpre_s @ w1_s^T, and the slice's
    dw1/db1/dw2. LN backs + vector grads live in `_epi_bwd_combine_kernel`.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)

    s2 = s2_ref[0].astype(jnp.float32)
    s1 = s1_ref[0].astype(jnp.float32)

    x32 = x_ref[:].astype(jnp.float32)
    s32 = x32 + y_ref[:].astype(jnp.float32)
    n2_32, xhat2, rsig2 = _ln_fwd_f32(s32, s2, s2_ref[1].astype(jnp.float32),
                                      eps)
    n2 = n2_32.astype(x_ref.dtype)
    o32 = s32 + m_ref[:].astype(jnp.float32)

    mu1 = jnp.mean(o32, axis=-1, keepdims=True)
    xc1 = o32 - mu1
    var1 = jnp.mean(xc1 * xc1, axis=-1, keepdims=True)
    rsig1 = jax.lax.rsqrt(var1 + eps)
    xhat1 = xc1 * rsig1

    g = g_ref[:].astype(jnp.float32)
    do32 = _ln_bwd_f32(g, xhat1, rsig1, s1)
    dm = do32.astype(x_ref.dtype)

    pre = jnp.dot(n2, w1_ref[:], preferred_element_type=jnp.float32)
    pre = pre + b1_ref[0].astype(jnp.float32)
    h32, dgelu = _gelu_and_grad(pre, gelu_exact)  # one shared erf pass
    h = h32.astype(x_ref.dtype)
    dh = jax.lax.dot_general(                       # dm @ w2_s^T
        dm, w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dpre32 = dh * dgelu
    dpre = dpre32.astype(x_ref.dtype)
    dn2_ref[:] = jax.lax.dot_general(               # dpre @ w1_s^T
        dpre, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    dw1_p = jax.lax.dot_general(                    # n2^T @ dpre
        n2, dpre, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw2_p = jax.lax.dot_general(                    # h^T @ dm
        h, dm, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_p = jnp.sum(dpre32, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw1_s[:, :] = dw1_p
        dw2_s[:, :] = dw2_p
        db1_s[:, :] = db1_p

    @pl.when(i > 0)
    def _():
        dw1_s[:, :] = dw1_s[:, :] + dw1_p
        dw2_s[:, :] = dw2_s[:, :] + dw2_p
        db1_s[:, :] = db1_s[:, :] + db1_p

    @pl.when(i == n - 1)
    def _():
        dw1_ref[:, :] = dw1_s[:, :]
        dw2_ref[:, :] = dw2_s[:, :]
        db1_ref[:, :] = db1_s[:, :]


def _epi_bwd_combine_kernel(x_ref, y_ref, g_ref, m_ref, s2_ref, s1_ref,
                            dn2_ref, ds_ref, ds1_ref, db1n_ref, ds2_ref,
                            db2_ref, dbw2_ref, vec_s, *, eps, gelu_exact):
    """Final pass: LN2 backward of the summed dn2 + the vector grads.
    Grid (row_tiles,). ds = do32 + ln2_bwd(dn2)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    C = x_ref.shape[1]

    s2 = s2_ref[0].astype(jnp.float32)
    s1 = s1_ref[0].astype(jnp.float32)

    x32 = x_ref[:].astype(jnp.float32)
    s32 = x32 + y_ref[:].astype(jnp.float32)
    _, xhat2, rsig2 = _ln_fwd_f32(s32, s2, s2_ref[1].astype(jnp.float32),
                                  eps)
    o32 = s32 + m_ref[:].astype(jnp.float32)

    mu1 = jnp.mean(o32, axis=-1, keepdims=True)
    xc1 = o32 - mu1
    var1 = jnp.mean(xc1 * xc1, axis=-1, keepdims=True)
    rsig1 = jax.lax.rsqrt(var1 + eps)
    xhat1 = xc1 * rsig1

    g = g_ref[:].astype(jnp.float32)
    do32 = _ln_bwd_f32(g, xhat1, rsig1, s1)
    dn2 = dn2_ref[:]
    ds = do32 + _ln_bwd_f32(dn2, xhat2, rsig2, s2)
    ds_ref[:] = ds.astype(ds_ref.dtype)

    vec_p = jnp.stack([
        jnp.sum(g * xhat1, axis=0),            # ds1
        jnp.sum(g, axis=0),                    # db1n
        jnp.sum(dn2 * xhat2, axis=0),          # ds2
        jnp.sum(dn2, axis=0),                  # db2
        jnp.sum(do32, axis=0),                 # dbw2
    ])

    @pl.when(i == 0)
    def _():
        vec_s[:, :] = vec_p

    @pl.when(i > 0)
    def _():
        vec_s[:, :] = vec_s[:, :] + vec_p

    @pl.when(i == n - 1)
    def _():
        ds1_ref[0, :] = vec_s[0, :]
        db1n_ref[0, :] = vec_s[1, :]
        ds2_ref[0, :] = vec_s[2, :]
        db2_ref[0, :] = vec_s[3, :]
        dbw2_ref[0, :] = vec_s[4, :]


def fused_epilogue_bwd_streamed(x, y, s2, b2, w1, b1, w2, bw2, s1, g, m,
                                gelu_exact=True, eps=1e-5, n_slices=2,
                                interpret=False):
    """h-sliced fused backward for shapes whose weights + grad accumulators
    don't fit VMEM at once (stage 2: C=1024, hidden=4096). Needs the
    forward's bf16-rounded MLP output `m` (one extra (rows, C) residual —
    the reference math rounds m to the model dtype before the second
    residual add, so saving it loses nothing). Same returns as
    `fused_epilogue_bwd`."""
    *lead, C = x.shape
    x2d = x.reshape(-1, C)
    y2d = y.reshape(-1, C)
    g2d = g.reshape(-1, C)
    m2d = m.reshape(-1, C)
    R = x2d.shape[0]
    hidden = w1.shape[1]
    assert hidden % n_slices == 0
    hb = hidden // n_slices
    isz = jnp.dtype(x.dtype).itemsize

    resident = C * hb * (2 * isz + 8)
    per_row = _bwd_streamed_per_row(C, hb, isz)
    tk = _pick_bwd_row_tile(R, resident, per_row)
    if tk is None:
        raise ValueError(
            f"fused_epilogue_bwd_streamed: no row tile divides R={R} "
            f"(C={C}, hidden={hidden}); use the XLA vjp fallback")

    row = pl.BlockSpec((tk, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const = lambda i: (0, 0)
    s2b2 = jnp.stack([s2, b2]).astype(jnp.float32)
    s1r = s1[None].astype(jnp.float32)

    dn2 = None
    dw1_parts, db1_parts, dw2_parts = [], [], []
    for sl in range(n_slices):
        w1_s = jax.lax.slice_in_dim(w1, sl * hb, (sl + 1) * hb, axis=1)
        b1_s = jax.lax.slice_in_dim(b1, sl * hb, (sl + 1) * hb, axis=0)
        w2_s = jax.lax.slice_in_dim(w2, sl * hb, (sl + 1) * hb, axis=0)
        slice_call = pl.pallas_call(
            functools.partial(_epi_bwd_slice_kernel, eps=eps,
                              gelu_exact=gelu_exact),
            grid=(R // tk,),
            in_specs=[
                row, row, row, row,
                pl.BlockSpec((2, C), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((C, hb), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hb), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, C), const, memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tk, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, hb), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hb), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, C), const, memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((R, C), jnp.float32),       # dn2 part
                jax.ShapeDtypeStruct((C, hb), jnp.float32),      # dw1 slice
                jax.ShapeDtypeStruct((1, hb), jnp.float32),      # db1 slice
                jax.ShapeDtypeStruct((hb, C), jnp.float32),      # dw2 slice
            ),
            scratch_shapes=[
                pltpu.VMEM((C, hb), jnp.float32),
                pltpu.VMEM((hb, C), jnp.float32),
                pltpu.VMEM((1, hb), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )
        outs = guard_no_vmap(slice_call, "fused_epilogue_bwd_streamed")(
            x2d, y2d, g2d, m2d, s2b2, s1r,
            w1_s.astype(x.dtype), b1_s[None].astype(jnp.float32),
            w2_s.astype(x.dtype))
        dn2_p, dw1_p, db1_p, dw2_p = outs
        dn2 = dn2_p if dn2 is None else dn2 + dn2_p
        dw1_parts.append(dw1_p)
        db1_parts.append(db1_p[0])
        dw2_parts.append(dw2_p)

    combine_call = pl.pallas_call(
        functools.partial(_epi_bwd_combine_kernel, eps=eps,
                          gelu_exact=gelu_exact),
        grid=(R // tk,),
        in_specs=[
            row, row, row, row,
            pl.BlockSpec((2, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            row,
        ],
        out_specs=(
            pl.BlockSpec((tk, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, C), x.dtype),               # ds
            jax.ShapeDtypeStruct((1, C), jnp.float32),           # ds1
            jax.ShapeDtypeStruct((1, C), jnp.float32),           # db1n
            jax.ShapeDtypeStruct((1, C), jnp.float32),           # ds2
            jax.ShapeDtypeStruct((1, C), jnp.float32),           # db2
            jax.ShapeDtypeStruct((1, C), jnp.float32),           # dbw2
        ),
        scratch_shapes=[pltpu.VMEM((5, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )
    outs = guard_no_vmap(combine_call, "fused_epilogue_bwd_streamed")(
        x2d, y2d, g2d, m2d, s2b2, s1r, dn2)
    ds, ds1, db1n, ds2, db2, dbw2 = outs

    dw1 = jnp.concatenate(dw1_parts, axis=1)
    db1 = jnp.concatenate(db1_parts, axis=0)
    dw2 = jnp.concatenate(dw2_parts, axis=0)
    return (ds.reshape(*lead, C), ds2[0], db2[0], dw1, db1, dw2,
            dbw2[0], ds1[0], db1n[0])


def _epilogue_bwd_streamed_applicable(x, w1, dtype):
    """Stage-2-class shapes: monolithic backward doesn't fit, but halving
    the hidden dim per call does (hb=2048: ~25MB resident vs ~50MB)."""
    from stswincl_tpu.ops.pallas_attention import _is_tpu_backend
    C = x.shape[-1]
    hidden = w1.shape[1]
    isz = jnp.dtype(dtype).itemsize
    resident = C * hidden * (2 * isz + 8)
    half = resident // 2
    R = x.size // C
    tk = (_pick_bwd_row_tile(R, half,
                             _bwd_streamed_per_row(C, hidden // 2, isz))
          if hidden % 2 == 0 else None)
    return (_is_tpu_backend() and resident > 20 * 1024 * 1024
            and hidden % 2 == 0 and half <= 32 * 1024 * 1024
            and tk is not None)


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


def _epilogue_kernel_with_m(x_ref, y_ref, s2_ref, b2_ref, w1_ref, b1_ref,
                            w2_ref, bw2_ref, s1_ref, b1n_ref, out_ref, m_ref,
                            xn, sum32, acc, *, eps, gelu_exact):
    """`_epilogue_kernel` that ALSO writes the bf16-rounded MLP output `m`
    (the residual the h-sliced backward needs). Kept separate so the
    inference path pays nothing."""
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
        m = acc[:].astype(m_ref.dtype)
        m_ref[:] = m
        # match the reference math: the residual add consumes the ROUNDED
        # m (swin_block_epilogue_ref: out32 = s32 + m.astype(f32)) so the
        # saved residual reproduces the backward's o32 exactly
        s32 = sum32[:] + m.astype(jnp.float32)
        mu = jnp.mean(s32, axis=-1, keepdims=True)
        xc = s32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        n = xc * jax.lax.rsqrt(var + eps)
        n = n * s1_ref[0].astype(jnp.float32) + b1n_ref[0].astype(jnp.float32)
        out_ref[:] = n.astype(out_ref.dtype)


def _fused_epilogue_fwd_with_m(x, y, s2, b2, w1, b1, w2, bw2, s1, b1n,
                               gelu_exact=True, eps=1e-5, interpret=False):
    """Forward epilogue that also returns the bf16-rounded MLP output `m`
    for the h-sliced backward. Same routing constants as the main kernel."""
    *lead, C = x.shape
    x2d = x.reshape(-1, C)
    y2d = y.reshape(-1, C)
    R = x2d.shape[0]
    hidden = w1.shape[1]
    isz = jnp.dtype(x.dtype).itemsize
    hb = _pick_h_block(hidden, C, isz)
    w_bytes = (1 if hb == hidden else 2) * 2 * C * hb * isz
    tk = _pick_row_tile_epi(R, C, hb, isz, w_bytes, hidden)

    row_spec = pl.BlockSpec((tk, C), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_c = pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    out, m = pl.pallas_call(
        functools.partial(_epilogue_kernel_with_m, eps=eps,
                          gelu_exact=gelu_exact),
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
        out_specs=(row_spec, row_spec),
        out_shape=(jax.ShapeDtypeStruct(x2d.shape, x.dtype),
                   jax.ShapeDtypeStruct(x2d.shape, x.dtype)),
        scratch_shapes=[pltpu.VMEM((tk, C), x.dtype),
                        pltpu.VMEM((tk, C), jnp.float32),
                        pltpu.VMEM((tk, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(x2d, y2d, s2[None].astype(jnp.float32), b2[None].astype(jnp.float32),
      w1.astype(x.dtype), b1[None].astype(jnp.float32), w2.astype(x.dtype),
      bw2[None].astype(jnp.float32), s1[None].astype(jnp.float32),
      b1n[None].astype(jnp.float32))
    return out.reshape(*lead, C), m.reshape(*lead, C)


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
    if not interpret and _epilogue_bwd_streamed_applicable(x, w1, x.dtype):
        # stage-2-class shape: run the m-emitting forward on the unshifted
        # y (one roll) so the h-sliced backward has its residual
        y = jnp.roll(y_shifted, (shift, shift), axis=(2, 3))
        out, m = _fused_epilogue_fwd_with_m(
            x, y, s2, b2, w1, b1, w2, bw2, s1, b1n, gelu_exact, eps)
        return out, (x, y_shifted, s2, b2, w1, b1, w2, bw2, s1, b1n, m)
    out = fused_swin_block_epilogue_shifted(
        x, y_shifted, s2, b2, w1, b1, w2, bw2, s1, b1n, shift, ws,
        gelu_exact, eps, interpret)
    return out, (x, y_shifted, s2, b2, w1, b1, w2, bw2, s1, b1n, None)


def _epis_bwd(shift, ws, gelu_exact, eps, interpret, res, g):
    x, y_shifted, s2, b2, w1, b1, w2, bw2, s1, b1n, m = res
    args = (x, y_shifted, s2, b2, w1, b1, w2, bw2, s1, b1n)
    if m is not None:
        y = jnp.roll(y_shifted, (shift, shift), axis=(2, 3))
        (ds, ds2, db2, dw1, db1, dw2, dbw2, ds1,
         db1n_g) = fused_epilogue_bwd_streamed(
            x, y, s2, b2, w1, b1, w2, bw2, s1, g, m, gelu_exact, eps)
        dy_shifted = jnp.roll(ds, (-shift, -shift), axis=(2, 3))
        grads = (ds, dy_shifted, ds2, db2, dw1, db1, dw2, dbw2, ds1, db1n_g)
        return tuple(gr.astype(r.dtype) for gr, r in zip(grads, args))
    if not interpret and _epilogue_bwd_applicable(x, w1, x.dtype):
        # un-shift y once (one roll), run the fused flat backward, and
        # shift the y-grad back — the heavy hidden-dim recompute stays in
        # VMEM; only the two cheap C-wide rolls remain in XLA
        y = jnp.roll(y_shifted, (shift, shift), axis=(2, 3))
        (ds, ds2, db2, dw1, db1, dw2, dbw2, ds1, db1n_g) = fused_epilogue_bwd(
            x, y, s2, b2, w1, b1, w2, bw2, s1, g, gelu_exact, eps)
        dy_shifted = jnp.roll(ds, (-shift, -shift), axis=(2, 3))
        grads = (ds, dy_shifted, ds2, db2, dw1, db1, dw2, dbw2, ds1, db1n_g)
        return tuple(gr.astype(r.dtype) for gr, r in zip(grads, args))
    _, vjp = jax.vjp(
        lambda *a: swin_block_epilogue_shifted_ref(
            *a, shift, gelu_exact, eps), *args)
    grads = vjp(g)
    return tuple(gr.astype(r.dtype) for gr, r in zip(grads, args))


fused_swin_block_epilogue_shifted.defvjp(_epis_fwd, _epis_bwd)


def _epi_fwd(x, y, s2, b2, w1, b1, w2, bw2, s1, b1n, gelu_exact, eps,
             interpret):
    if not interpret and _epilogue_bwd_streamed_applicable(x, w1, x.dtype):
        out, m = _fused_epilogue_fwd_with_m(
            x, y, s2, b2, w1, b1, w2, bw2, s1, b1n, gelu_exact, eps)
        return out, (x, y, s2, b2, w1, b1, w2, bw2, s1, b1n, m)
    out = fused_swin_block_epilogue(x, y, s2, b2, w1, b1, w2, bw2, s1, b1n,
                                    gelu_exact, eps, interpret)
    return out, (x, y, s2, b2, w1, b1, w2, bw2, s1, b1n, None)


def _epi_bwd(gelu_exact, eps, interpret, res, g):
    x, y, s2, b2, w1, b1, w2, bw2, s1, b1n, m = res
    args = (x, y, s2, b2, w1, b1, w2, bw2, s1, b1n)
    if m is not None:
        (ds, ds2, db2, dw1, db1, dw2, dbw2, ds1,
         db1n_g) = fused_epilogue_bwd_streamed(
            x, y, s2, b2, w1, b1, w2, bw2, s1, g, m, gelu_exact, eps)
        grads = (ds, ds, ds2, db2, dw1, db1, dw2, dbw2, ds1, db1n_g)
        return tuple(gr.astype(r.dtype) for gr, r in zip(grads, args))
    if not interpret and _epilogue_bwd_applicable(x, w1, x.dtype):
        (ds, ds2, db2, dw1, db1, dw2, dbw2, ds1, db1n_g) = fused_epilogue_bwd(
            x, y, s2, b2, w1, b1, w2, bw2, s1, g, gelu_exact, eps)
        grads = (ds, ds, ds2, db2, dw1, db1, dw2, dbw2, ds1, db1n_g)
        return tuple(gr.astype(r.dtype) for gr, r in zip(grads, args))
    _, vjp = jax.vjp(
        lambda *a: swin_block_epilogue_ref(*a, gelu_exact, eps), *args)
    grads = vjp(g)
    return tuple(gr.astype(r.dtype) for gr, r in zip(grads, args))


fused_swin_block_epilogue.defvjp(_epi_fwd, _epi_bwd)
