"""Fused add+LN+MLP kernel: interpret parity, grads, block routing."""

import numpy as np
import jax
import jax.numpy as jnp

from stswincl_tpu.ops.pallas_add_ln_mlp import (
    fused_add_ln_mlp,
    add_ln_mlp_ref,
)


def _params(rng, C=64, hidden=256, rows=96):
    x = jnp.asarray(rng.standard_normal((2, rows, C)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, rows, C)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1 + 1.0)
    b = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.standard_normal((C, hidden)).astype(np.float32) * .05)
    b1 = jnp.asarray(rng.standard_normal(hidden).astype(np.float32) * .05)
    w2 = jnp.asarray(rng.standard_normal((hidden, C)).astype(np.float32) * .05)
    b2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * .05)
    return x, y, s, b, w1, b1, w2, b2


def test_forward_matches_ref(rng):
    args = _params(rng)
    for exact in (True, False):
        gs, go = fused_add_ln_mlp(*args, exact, 1e-5, True)
        ws, wo = add_ln_mlp_ref(*args, exact)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(ws),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(go), np.asarray(wo),
                                   rtol=1e-4, atol=1e-5)


def test_hidden_blocking(rng):
    # hidden 512 with C=32 -> multiple h-block accumulation steps
    args = _params(rng, C=32, hidden=512)
    gs, go = fused_add_ln_mlp(*args, True, 1e-5, True)
    ws, wo = add_ln_mlp_ref(*args, True)
    np.testing.assert_allclose(np.asarray(go), np.asarray(wo),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ws),
                               rtol=1e-4, atol=1e-5)


def test_grads_match_ref(rng):
    args = _params(rng, C=32, hidden=128, rows=32)

    def loss_fused(*a):
        s, o = fused_add_ln_mlp(*a, True, 1e-5, True)
        return jnp.sum(jnp.sin(s)) + jnp.sum(o * o)

    def loss_ref(*a):
        s, o = add_ln_mlp_ref(*a, True)
        return jnp.sum(jnp.sin(s)) + jnp.sum(o * o)

    g_f = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
    g_r = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_epilogue_forward_matches_ref(rng):
    from stswincl_tpu.ops.pallas_add_ln_mlp import (
        fused_swin_block_epilogue, swin_block_epilogue_ref)

    x, y, s, b, w1, b1, w2, b2 = _params(rng)
    s1 = jnp.asarray(rng.standard_normal(64).astype(np.float32) * 0.1 + 1.0)
    b1n = jnp.asarray(rng.standard_normal(64).astype(np.float32) * 0.1)
    for exact in (True, False):
        got = fused_swin_block_epilogue(x, y, s, b, w1, b1, w2, b2, s1, b1n,
                                        exact, 1e-5, True)
        want = swin_block_epilogue_ref(x, y, s, b, w1, b1, w2, b2, s1, b1n,
                                       exact)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_epilogue_hidden_blocking_and_grads(rng):
    from stswincl_tpu.ops.pallas_add_ln_mlp import (
        fused_swin_block_epilogue, swin_block_epilogue_ref)

    x, y, s, b, w1, b1, w2, b2 = _params(rng, C=32, hidden=512, rows=32)
    s1 = jnp.asarray(rng.standard_normal(32).astype(np.float32) * 0.1 + 1.0)
    b1n = jnp.asarray(rng.standard_normal(32).astype(np.float32) * 0.1)
    args = (x, y, s, b, w1, b1, w2, b2, s1, b1n)

    got = fused_swin_block_epilogue(*args, True, 1e-5, True)
    want = swin_block_epilogue_ref(*args, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    g_f = jax.grad(lambda *a: jnp.sum(
        fused_swin_block_epilogue(*a, True, 1e-5, True) ** 2),
        argnums=tuple(range(10)))(*args)
    g_r = jax.grad(lambda *a: jnp.sum(
        swin_block_epilogue_ref(*a, True) ** 2),
        argnums=tuple(range(10)))(*args)
    for a, b_ in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_block_routes_fused_epilogue(rng, monkeypatch):
    """Forced-TPU routing (einsum attention, interpret kernels):
    SpaceTimeSwinBlock == the pure-flax path on identical params."""
    from stswincl_tpu.models.swin import SpaceTimeSwinBlock
    import stswincl_tpu.ops.pallas_add_ln_mlp as kmod
    import stswincl_tpu.ops.pallas_attention as attnmod

    block = SpaceTimeSwinBlock(32, (16, 16), 4, window_size=8, shift_size=4,
                               attn_impl="einsum")
    x = jnp.asarray(rng.standard_normal((1, 2, 256, 32)).astype(np.float32))
    variables = block.init(jax.random.key(0), x)
    want = block.apply(variables, x)

    orig_epi = kmod.fused_swin_block_epilogue
    monkeypatch.setattr(
        kmod, "fused_swin_block_epilogue",
        lambda x, y, s2, b2, w1, b1, w2, bw2, s1, b1n, ge=True, eps=1e-5,
        it=False: orig_epi(x, y, s2, b2, w1, b1, w2, bw2, s1, b1n, ge, eps,
                           True))
    monkeypatch.setattr(attnmod, "_is_tpu_backend", lambda: True)

    got = block.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_epilogue_shifted_matches_ref(rng):
    from stswincl_tpu.ops.pallas_add_ln_mlp import (
        fused_swin_block_epilogue_shifted, swin_block_epilogue_shifted_ref)

    B, T, H, W, C, ws, ss = 2, 2, 8, 12, 32, 4, 2
    hidden = 4 * C
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    s2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1 + 1)
    b2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    s1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1 + 1)
    b1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.standard_normal((C, hidden)).astype(np.float32) * 0.1)
    bw1 = jnp.asarray(rng.standard_normal(hidden).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((hidden, C)).astype(np.float32) * 0.1)
    bw2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)

    got = fused_swin_block_epilogue_shifted(
        x, y, s2, b2, w1, bw1, w2, bw2, s1, b1, ss, ws, True, 1e-5, True)
    want = swin_block_epilogue_shifted_ref(
        x, y, s2, b2, w1, bw1, w2, bw2, s1, b1, ss)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss_k(x, y, w1):
        return jnp.sum(fused_swin_block_epilogue_shifted(
            x, y, s2, b2, w1, bw1, w2, bw2, s1, b1, ss, ws, True, 1e-5,
            True) ** 2)

    def loss_r(x, y, w1):
        return jnp.sum(swin_block_epilogue_shifted_ref(
            x, y, s2, b2, w1, bw1, w2, bw2, s1, b1, ss) ** 2)

    g0 = jax.grad(loss_k, argnums=(0, 1, 2))(x, y, w1)
    g1 = jax.grad(loss_r, argnums=(0, 1, 2))(x, y, w1)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_fused_epilogue_bwd_matches_ref_vjp(rng):
    """The fused backward kernel (interpret mode) == jax.vjp of
    swin_block_epilogue_ref for every input and parameter grad."""
    from stswincl_tpu.ops.pallas_add_ln_mlp import (
        fused_epilogue_bwd, swin_block_epilogue_ref)

    R, C = 48, 32
    hidden = 4 * C
    x = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32))
    s2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1 + 1)
    b2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    s1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1 + 1)
    b1n = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.standard_normal((C, hidden)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal(hidden).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((hidden, C)).astype(np.float32) * 0.1)
    bw2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)

    (ds, ds2, db2, dw1, db1, dw2, dbw2, ds1, db1n) = fused_epilogue_bwd(
        x, y, s2, b2, w1, b1, w2, bw2, s1, g, True, 1e-5, True)

    _, vjp = jax.vjp(
        lambda *a: swin_block_epilogue_ref(*a, True, 1e-5),
        x, y, s2, b2, w1, b1, w2, bw2, s1, b1n)
    (rx, ry, rs2, rb2, rw1, rb1, rw2, rbw2, rs1, rb1n) = vjp(g)

    np.testing.assert_allclose(np.asarray(ds), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(ry),
                               rtol=1e-4, atol=1e-4)
    for got, want, name in [(ds2, rs2, "ds2"), (db2, rb2, "db2"),
                            (dw1, rw1, "dw1"), (db1, rb1, "db1"),
                            (dw2, rw2, "dw2"), (dbw2, rbw2, "dbw2"),
                            (ds1, rs1, "ds1"), (db1n, rb1n, "db1n")]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_fused_epilogue_bwd_streamed_matches_ref_vjp(rng):
    """The h-sliced backward (interpret, n_slices=2) == jax.vjp of
    swin_block_epilogue_ref, given the forward's rounded MLP output m."""
    from stswincl_tpu.ops.pallas_add_ln_mlp import (
        fused_epilogue_bwd_streamed, swin_block_epilogue_ref,
        _fused_epilogue_fwd_with_m)

    R, C = 48, 32
    hidden = 4 * C
    x = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32))
    s2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1 + 1)
    b2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    s1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1 + 1)
    b1n = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.standard_normal((C, hidden)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal(hidden).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((hidden, C)).astype(np.float32) * 0.1)
    bw2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)

    # the m-emitting forward must agree with the ref AND hand back the
    # rounded mlp output the sliced backward consumes
    out, m = _fused_epilogue_fwd_with_m(
        x, y, s2, b2, w1, b1, w2, bw2, s1, b1n, True, 1e-5, True)
    ref_out = swin_block_epilogue_ref(
        x, y, s2, b2, w1, b1, w2, bw2, s1, b1n, True, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-4)

    (ds, ds2, db2, dw1, db1, dw2, dbw2, ds1,
     db1n_g) = fused_epilogue_bwd_streamed(
        x, y, s2, b2, w1, b1, w2, bw2, s1, g, m, True, 1e-5, 2, True)

    _, vjp = jax.vjp(
        lambda *a: swin_block_epilogue_ref(*a, True, 1e-5),
        x, y, s2, b2, w1, b1, w2, bw2, s1, b1n)
    (rx, ry, rs2, rb2, rw1, rb1, rw2, rbw2, rs1, rb1n) = vjp(g)

    np.testing.assert_allclose(np.asarray(ds), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    for got, want, name in [(ds2, rs2, "ds2"), (db2, rb2, "db2"),
                            (dw1, rw1, "dw1"), (db1, rb1, "db1"),
                            (dw2, rw2, "dw2"), (dbw2, rbw2, "dbw2"),
                            (ds1, rs1, "ds1"), (db1n_g, rb1n, "db1n")]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_bwd_routing_rejects_undividable_row_counts(rng):
    """An input whose flattened row count no tile divides (R % 8 != 0) must
    be REJECTED by the routing predicates — the epilogue backward then
    takes the XLA vjp instead of crashing at trace time (round-4 advisor
    finding: the old predicates checked only the resident-weight size)."""
    from stswincl_tpu.ops.pallas_add_ln_mlp import (
        _epilogue_bwd_applicable, _epilogue_bwd_streamed_applicable,
        _pick_bwd_row_tile, fused_epilogue_bwd)
    import stswincl_tpu.ops.pallas_attention as pa

    # the tile picker itself: divisibility + budget
    assert _pick_bwd_row_tile(44, 0, 1) is None          # 44 % 8 != 0
    assert _pick_bwd_row_tile(512, 0, 1) == 512
    assert _pick_bwd_row_tile(24, 0, 1) == 8
    assert _pick_bwd_row_tile(512, 65 * 1024 * 1024, 1) is None  # over budget

    C, hidden = 32, 128
    x_bad = jnp.zeros((44, C), jnp.float32)   # R=44: no tile divides
    x_good = jnp.zeros((48, C), jnp.float32)  # R=48: tk=16 works
    w1 = jnp.zeros((C, hidden), jnp.float32)

    orig = pa._is_tpu_backend
    pa._is_tpu_backend = lambda: True
    try:
        assert not _epilogue_bwd_applicable(x_bad, w1, jnp.float32)
        assert _epilogue_bwd_applicable(x_good, w1, jnp.float32)
        assert not _epilogue_bwd_streamed_applicable(x_bad, w1, jnp.float32)
    finally:
        pa._is_tpu_backend = orig

    # a bypassing caller gets a clear error, not a bare assert
    args = [jnp.zeros(s, jnp.float32) for s in
            ((44, C), (44, C), (C,), (C,), (C, hidden), (hidden,),
             (hidden, C), (C,), (C,), (44, C))]
    try:
        fused_epilogue_bwd(*args)
        raised = False
    except ValueError as e:
        raised = "no row tile divides" in str(e)
    assert raised
