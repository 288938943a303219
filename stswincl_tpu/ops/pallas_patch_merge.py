"""Fused PatchMerging (2x2 space-to-depth + LayerNorm + Linear 4C -> 2C).

Reference semantics: `swin_512.py:239-277` (PatchMerging) — concat the four
2x2 neighbors, LayerNorm over the 4C features, then a bias-free Linear to
2C. The XLA lowering of the flax path materializes a full-resolution fp32
LayerNorm output at 4C channels (f32[32,32,40,2048] = 335 MB at the bs=8
clip shape) AND a pure layout copy of it before the reduction matmul —
measured 2.6 ms/batch of the r5 clip trace (maximum_convert_fusion 0.64 +
copy 1.03 + reduction fusion 0.93) for an op whose roofline is ~1.1 ms
(read 168 MB bf16 + 172 GFLOP matmul + write 84 MB).

This kernel does the whole op in one pass: each grid cell reads a
(2*rb, W, C) row band, regroups the four spatial parities IN VMEM, runs the
fp32 LayerNorm on the (rows, 4C) features without ever forming the concat
in HBM, and feeds the bf16-rounded normalized chunks straight into the
VMEM-resident (4C, 2C) reduction matmul.

Parity regrouping without strided loads: splitting the band's row axis
(untiled) gives the row parities; merging each row-parity's (W, C) minor
pair into (W/2, 2C) lanes is a contiguous row-major reshape, so the chunk
order inside the kernel is [x0 | x2 | x1 | x3] (w-parity minor) instead of
the reference's [x0 | x1 | x2 | x3]. The wrapper permutes the LayerNorm
scale/bias and the reduction-weight ROWS host-side to compensate — LN is
permutation-invariant given matching parameter order, so the math is
unchanged.

Differentiable via custom_vjp: backward = `jax.vjp` of the XLA reference
(`patch_merge_ref`, exact same math in canonical chunk order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, s_ref, b_ref, w_ref, out_ref, *, eps):
    """x_ref: (1, 2*rb, W, C) input band; s/b: (1, 4C) LN params in the
    kernel's [x0|x2|x1|x3] chunk order; w: (4C, 2C) reduction weights, rows
    in the same order; out_ref: (1, rb, W/2, 2C)."""
    _, RH, Wd, C = x_ref.shape
    rb = RH // 2
    half = Wd // 2
    rows = rb * half
    C2 = 2 * C

    z = x_ref[0].reshape(rb, 2, half, C2)  # row-major regroup (see header)
    a = z[:, 0].reshape(rows, C2).astype(jnp.float32)  # even rows: [x0 | x2]
    b = z[:, 1].reshape(rows, C2).astype(jnp.float32)  # odd rows:  [x1 | x3]

    inv = 1.0 / (2 * C2)
    mu = (jnp.sum(a, axis=-1, keepdims=True)
          + jnp.sum(b, axis=-1, keepdims=True)) * inv
    sq = (jnp.sum(a * a, axis=-1, keepdims=True)
          + jnp.sum(b * b, axis=-1, keepdims=True)) * inv
    rsig = jax.lax.rsqrt(sq - mu * mu + eps)

    s32 = s_ref[0].astype(jnp.float32)
    b32 = b_ref[0].astype(jnp.float32)
    na = ((a - mu) * rsig * s32[:C2] + b32[:C2]).astype(out_ref.dtype)
    nb = ((b - mu) * rsig * s32[C2:] + b32[C2:]).astype(out_ref.dtype)

    out = jnp.dot(na, w_ref[:C2], preferred_element_type=jnp.float32)
    out = out + jnp.dot(nb, w_ref[C2:], preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype).reshape(rb, half, C2)


def patch_merge_ref(x, scale, bias, w, eps=1e-5):
    """XLA reference (and the custom-vjp backward math): canonical
    [x0, x1, x2, x3] concat, fp32 fast-variance LayerNorm, bf16-rounded
    normalized features into the bf16 reduction matmul with fp32
    accumulation — expression-for-expression the flax
    concat -> LayerNorm(dtype) -> Dense(dtype) path this kernel replaces."""
    BT, H, W, C = x.shape
    x0 = x[:, 0::2, 0::2, :]
    x1 = x[:, 1::2, 0::2, :]
    x2 = x[:, 0::2, 1::2, :]
    x3 = x[:, 1::2, 1::2, :]
    xc = jnp.concatenate([x0, x1, x2, x3], axis=-1).astype(jnp.float32)
    mu = jnp.mean(xc, axis=-1, keepdims=True)
    var = jnp.mean(xc * xc, axis=-1, keepdims=True) - mu * mu
    n = (xc - mu) * jax.lax.rsqrt(var + eps)
    n = n * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    n = n.astype(x.dtype)
    out = jnp.dot(n, w.astype(x.dtype), preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def _chunk_perm(v, C):
    """[x0, x1, x2, x3] chunk order -> the kernel's [x0, x2, x1, x3]
    (first axis: the 4C feature axis of scale/bias, or the weight rows)."""
    return jnp.concatenate(
        [v[:C], v[2 * C:3 * C], v[C:2 * C], v[3 * C:]], axis=0)


def _pick_rb(h_out: int, half: int, C: int, isz: int) -> int:
    """Output row-band height: the largest divisor of h_out whose VMEM
    working set fits the budget — bigger bands mean bigger-M matmuls.

    Accounting per band: in/out blocks x2 pipeline buffers, the resident
    (4C, 2C) weights, fp32 a/b chunk views + acc, and the bf16 normalized
    chunks (16 bytes + 6*isz per row*2C element all told)."""
    budget = 26 * 1024 * 1024
    weights = 4 * C * 2 * C * isz
    best = 1
    for rb in range(1, h_out + 1):
        if h_out % rb:
            continue
        rows = rb * half
        blocks = 2 * (2 * rb * 2 * half * C * isz) + 2 * (rows * 2 * C * isz)
        working = rows * 2 * C * 16 + rows * 2 * C * 2 * isz
        if rows <= 1024 and weights + blocks + working <= budget:
            best = rb
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_patch_merge(x, scale, bias, w, eps=1e-5, interpret=False):
    """PatchMerging as one Pallas kernel. x: (BT, H, W, C) ->
    (BT, H/2, W/2, 2C). scale/bias: (4C,) LayerNorm params; w: (4C, 2C)."""
    BT, H, W, C = x.shape
    half = W // 2
    h_out = H // 2
    rb = _pick_rb(h_out, half, C, jnp.dtype(x.dtype).itemsize)

    const = lambda i, j: (0, 0)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(BT, h_out // rb),
        in_specs=[
            pl.BlockSpec((1, 2 * rb, W, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * C, 2 * C), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, half, 2 * C),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BT, h_out, half, 2 * C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(x, _chunk_perm(scale, C)[None].astype(jnp.float32),
      _chunk_perm(bias, C)[None].astype(jnp.float32),
      _chunk_perm(w.astype(x.dtype), C))


def _fpm_fwd(x, scale, bias, w, eps, interpret):
    out = fused_patch_merge(x, scale, bias, w, eps, interpret)
    return out, (x, scale, bias, w)


def _fpm_bwd(eps, interpret, res, g):
    x, scale, bias, w = res
    _, vjp = jax.vjp(
        lambda a, s, b, ww: patch_merge_ref(a, s, b, ww, eps),
        x, scale, bias, w)
    return vjp(g)


fused_patch_merge.defvjp(_fpm_fwd, _fpm_bwd)


def patch_merge_applicable(x) -> bool:
    """Routing predicate: even spatial dims, lane-aligned channels, and a
    W/2 that keeps the in-kernel regroup's sublane count a multiple of 8."""
    from stswincl_tpu.ops.pallas_attention import _is_tpu_backend
    BT, H, W, C = x.shape
    return (_is_tpu_backend() and H % 2 == 0 and W % 2 == 0
            and C % 128 == 0 and (W // 2) % 8 == 0)
