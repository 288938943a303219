"""The backward Pallas kernels must RAISE under vmap, not fault the TPU.

Their sequential-grid weight-gradient accumulators index `pl.program_id` by
literal axis; Pallas' default batching rule prepends the vmap axis as a new
leading grid dimension, silently shifting those indices — on device this
faults the worker (bisected 2026-08-19, see `ops/vmap_guard.py` and
`train/train_contrast.py`). `guard_no_vmap` converts that into a trace-time
NotImplementedError; these tests pin the guard AND that the guarded calls
still work un-vmapped.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stswincl_tpu.ops.pallas_add_ln_mlp import fused_epilogue_bwd
from stswincl_tpu.ops.pallas_block_attention import (
    fused_swin_block_attention_bwd)
from stswincl_tpu.ops.window import relative_position_index


def _epi_args(rng, R=64, C=128, hidden=256):
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    x, y, g = mk(R, C), mk(R, C), mk(R, C)
    s2, b2, s1 = mk(C), mk(C), mk(C)
    w1, b1 = mk(C, hidden) * 0.05, mk(hidden)
    w2, bw2 = mk(hidden, C) * 0.05, mk(C)
    return x, y, s2, b2, w1, b1, w2, bw2, s1, g


def test_epilogue_bwd_unbatched_still_works(rng):
    args = _epi_args(rng)
    outs = fused_epilogue_bwd(*args, interpret=True)
    assert outs[0].shape == args[0].shape
    assert all(np.all(np.isfinite(np.asarray(o))) for o in outs)


def test_epilogue_bwd_vmap_raises(rng):
    args = _epi_args(rng)
    batched = jax.tree.map(lambda a: jnp.stack([a, a]), args)
    with pytest.raises(NotImplementedError, match="cannot be vmapped"):
        jax.vmap(lambda *a: fused_epilogue_bwd(*a, interpret=True))(*batched)


def _attn_args(rng, B=1, T=2, H=8, W=16, C=128, heads=2, ws=4):
    TN = T * ws * ws
    N = ws * ws
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    x = mk(B, T, H, W, C)
    g = mk(B, T, H, W, C)
    wqkv, bqkv = mk(C, 3 * C) * 0.05, mk(3 * C)
    wproj = mk(C, C) * 0.05
    table = rng.standard_normal(((2 * ws - 1) ** 2, heads)).astype(
        np.float32) * 0.02
    idx = relative_position_index(ws, ws)
    bias = table[idx.reshape(-1)].reshape(N, N, heads).transpose(2, 0, 1)
    bias_tiled = jnp.asarray(np.tile(bias, (1, T, T)))
    mask_tiled = jnp.zeros((1, TN, TN), jnp.float32)
    scale = (C // heads) ** -0.5
    return (x, wqkv, bqkv, wproj, bias_tiled, mask_tiled, g), (heads, scale,
                                                               ws)


def test_attention_bwd_vmap_raises(rng):
    arrays, (heads, scale, ws) = _attn_args(rng)
    batched = jax.tree.map(lambda a: jnp.stack([a, a]), arrays)
    with pytest.raises(NotImplementedError, match="cannot be vmapped"):
        jax.vmap(lambda *a: fused_swin_block_attention_bwd(
            *a, heads, scale, ws, interpret=True))(*batched)
