"""Whole-block W-MSA mega-kernel: interpret-mode parity, grads, routing."""

import numpy as np
import jax
import jax.numpy as jnp

from stswincl_tpu.ops.window import relative_position_index
import stswincl_tpu.ops.pallas_swin_block as wb
from stswincl_tpu.ops.pallas_swin_block import (
    fused_whole_swin_block, whole_swin_block_ref, whole_block_applicable,
    _pick_chunks)


def _case(rng, B=1, T=2, H=8, W=16, C=32, heads=2, ws=4, dtype=jnp.float32):
    TN = T * ws * ws
    N = ws * ws
    hidden = 4 * C
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    x = f(B, T, H, W, C).astype(dtype)
    table = rng.standard_normal(((2 * ws - 1) ** 2, heads)).astype(
        np.float32) * 0.02
    idx = relative_position_index(ws, ws)
    bias = table[idx.reshape(-1)].reshape(N, N, heads).transpose(2, 0, 1)
    bias_tiled = jnp.asarray(np.tile(bias, (1, T, T)))
    mask_tiled = jnp.zeros((1, TN, TN), jnp.float32)
    args = (x, f(C, 3 * C) * 0.1, f(3 * C) * 0.1, f(C, C) * 0.1, f(C) * 0.1,
            bias_tiled, mask_tiled, f(C) * 0.1 + 1.0, f(C) * 0.1,
            f(C, hidden) * 0.1, f(hidden) * 0.1, f(hidden, C) * 0.1,
            f(C) * 0.1, f(C) * 0.1 + 1.0, f(C) * 0.1)
    scale = (C // heads) ** -0.5
    return args, heads, scale, ws


def test_whole_block_matches_ref(rng):
    args, heads, scale, ws = _case(rng)
    got = fused_whole_swin_block(*args, heads, scale, ws, True, 1e-5, True)
    want = whole_swin_block_ref(*args, heads, scale, ws, True, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_whole_block_chunked_paths_match(rng, monkeypatch):
    """Forced qkv/mlp row chunking is numerically identical (LN and the
    MLP are row-local; chunking only bounds the fp32 VMEM values)."""
    args, heads, scale, ws = _case(rng, T=2, H=8, W=16)
    want = fused_whole_swin_block(*args, heads, scale, ws, True, 1e-5, True)
    monkeypatch.setattr(wb, "_pick_chunks", lambda rows, w, b: 2)
    got = fused_whole_swin_block(*args, heads, scale, ws, True, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_whole_block_grads_match_ref(rng):
    args, heads, scale, ws = _case(rng)

    def loss_kernel(*a):
        return jnp.sum(fused_whole_swin_block(
            *a, heads, scale, ws, True, 1e-5, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(whole_swin_block_ref(
            *a, heads, scale, ws, True, 1e-5) ** 2)

    g = jax.grad(loss_kernel, argnums=tuple(range(15)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(15)))(*args)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_pick_chunks():
    # full fp32 intermediate fits -> one chunk
    assert _pick_chunks(1280, 2048, 12 * 1024 * 1024) == 1
    # needs splitting; chunks must divide rows and stay sublane multiples
    assert _pick_chunks(1280, 1536, 4 * 1024 * 1024) == 2
    # nothing fits -> 0 (caller must gate)
    assert _pick_chunks(8, 1 << 24, 1024) == 0


def test_applicability_envelope(monkeypatch):
    shape = (8, 2, 64, 80, 512)
    # default is OFF: the fusion measured 3-4% SLOWER end to end than the
    # two-kernel pair (module docstring) — opt-in via env for A/B runs
    assert not whole_block_applicable(shape, jnp.bfloat16, 512, 2048, 8, 0,
                                      None)
    monkeypatch.setenv("STSWIN_WHOLE_BLOCK", "1")
    assert whole_block_applicable(shape, jnp.bfloat16, 512, 2048, 8, 0, None)
    # SW blocks and the eval out_frame elision keep the two-kernel pair
    assert not whole_block_applicable(shape, jnp.bfloat16, 512, 2048, 8, 4,
                                      None)
    assert not whole_block_applicable(shape, jnp.bfloat16, 512, 2048, 8, 0,
                                      1)
    # stage-2 seg shape fits too
    assert whole_block_applicable((8, 2, 32, 40, 1024), jnp.bfloat16, 1024,
                                  4096, 8, 0, None)


def test_block_routes_whole_kernel(rng, monkeypatch):
    """Forced-TPU routing: a W-MSA SpaceTimeSwinBlock on the whole-block
    kernel (interpret) == the einsum/flax path on identical params."""
    from stswincl_tpu.models.swin import SpaceTimeSwinBlock
    import stswincl_tpu.ops.pallas_attention as attnmod

    block = SpaceTimeSwinBlock(32, (16, 16), 4, window_size=8, shift_size=0,
                               attn_impl="pallas_full")
    x = jnp.asarray(rng.standard_normal((1, 2, 256, 32)).astype(np.float32))
    ref_block = SpaceTimeSwinBlock(32, (16, 16), 4, window_size=8,
                                   shift_size=0, attn_impl="einsum")
    variables = ref_block.init(jax.random.key(0), x)
    want = ref_block.apply(variables, x)

    orig = wb.fused_whole_swin_block
    calls = []

    def interp(*a):
        calls.append(1)
        # the model passes (15 tensors, heads, scale, ws, gelu_exact)
        # positionally; append eps and interpret=True (custom_vjp callables
        # take no kwargs)
        assert len(a) == 19
        return orig(*a, 1e-5, True)

    monkeypatch.setattr(wb, "fused_whole_swin_block", interp)
    monkeypatch.setattr(attnmod, "_is_tpu_backend", lambda: True)
    monkeypatch.setenv("STSWIN_WHOLE_BLOCK", "1")

    got = block.apply(variables, x)
    assert calls, "whole-block kernel was not routed to"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)
