"""Image-layout fused window attention: interpret-mode parity + grads."""

import numpy as np
import jax
import jax.numpy as jnp

from stswincl_tpu.ops.window import (
    relative_position_index, shifted_window_attention_mask)
from stswincl_tpu.ops.pallas_block_attention import (
    windowed_attention_image, windowed_attention_image_ref)


def _case(rng, with_mask, B=2, T=2, H=8, W=12, C=32, heads=2, ws=4):
    TN = T * ws * ws
    N = ws * ws
    qkv = jnp.asarray(
        rng.standard_normal((B, T, H, W, 3 * C)).astype(np.float32))
    table = rng.standard_normal(((2 * ws - 1) ** 2, heads)).astype(np.float32) * 0.02
    idx = relative_position_index(ws, ws)
    bias = table[idx.reshape(-1)].reshape(N, N, heads).transpose(2, 0, 1)
    bias_tiled = jnp.asarray(np.tile(bias, (1, T, T)))
    if with_mask:
        m = shifted_window_attention_mask(H, W, ws, 2)
        mask_tiled = jnp.asarray(np.tile(m, (1, T, T)))
    else:
        mask_tiled = jnp.zeros((1, TN, TN), jnp.float32)
    scale = (C // heads) ** -0.5
    return qkv, bias_tiled, mask_tiled, heads, scale, ws


def test_kernel_matches_ref(rng):
    for with_mask in (False, True):
        qkv, bias, mask, heads, scale, ws = _case(rng, with_mask)
        got = windowed_attention_image(qkv, bias, mask, heads, scale, ws,
                                       True)
        want = windowed_attention_image_ref(qkv, bias, mask, heads, scale, ws)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_ref_matches_einsum_block_path(rng):
    """The XLA reference must equal the model's einsum partition path."""
    from stswincl_tpu.ops.attention import space_time_window_attention

    qkv, bias_tiled, mask_tiled, heads, scale, ws = _case(rng, True)
    B, T, H, W, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    nH, nW = H // ws, W // ws
    TN = T * ws * ws
    N = ws * ws
    # einsum path as in models/swin.py
    xw = qkv.reshape(B, T, nH, ws, nW, ws, C3)
    xw = xw.transpose(0, 2, 4, 1, 3, 5, 6).reshape(B * nH * nW, TN, 3, heads, hd)
    xw = xw.transpose(2, 0, 3, 1, 4)
    q, k, v = xw[0], xw[1], xw[2]
    rel_bias = np.asarray(bias_tiled)[:, :N, :N]  # untile
    mask = np.asarray(mask_tiled)[:, :N, :N]
    out = space_time_window_attention(q, k, v, jnp.asarray(rel_bias),
                                      jnp.asarray(mask), scale)
    out = out.transpose(0, 2, 1, 3).reshape(B, nH, nW, T, ws, ws, C)
    out = out.transpose(0, 3, 1, 4, 2, 5, 6).reshape(B, T, H, W, C)

    want = windowed_attention_image_ref(qkv, bias_tiled, mask_tiled, heads,
                                        scale, ws)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_kernel_grads_match_ref(rng):
    qkv, bias, mask, heads, scale, ws = _case(rng, True, B=1)

    def loss_kernel(qkv, bias, mask):
        return jnp.sum(windowed_attention_image(
            qkv, bias, mask, heads, scale, ws, True) ** 2)

    def loss_ref(qkv, bias, mask):
        return jnp.sum(windowed_attention_image_ref(
            qkv, bias, mask, heads, scale, ws) ** 2)

    g0 = jax.grad(loss_kernel, argnums=(0, 1, 2))(qkv, bias, mask)
    g1 = jax.grad(loss_ref, argnums=(0, 1, 2))(qkv, bias, mask)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_full_stack_pallas_matches_einsum_interpret(rng):
    """SwinTemporalStack with attn_impl='pallas' (interpreted) == einsum."""
    from stswincl_tpu.models import SwinTemporalStack
    import stswincl_tpu.ops.pallas_block_attention as pba

    x = jnp.asarray(rng.standard_normal((1, 4, 16, 16, 32)).astype(np.float32))
    m_e = SwinTemporalStack(dim=32, input_resolution=(16, 16), num_heads=4,
                            attn_impl="einsum")
    v = m_e.init(jax.random.key(0), x)
    s1_e, s2_e = m_e.apply(v, x)

    orig = pba.windowed_attention_image

    def forced(qkv, bias, mask, heads, scale, ws, interpret=False):
        return orig(qkv, bias, mask, heads, scale, ws, True)

    import stswincl_tpu.models.swin  # noqa: F401  (module uses local import)
    pba_backup = pba.windowed_attention_image
    pba.windowed_attention_image = forced
    try:
        m_p = SwinTemporalStack(dim=32, input_resolution=(16, 16),
                                num_heads=4, attn_impl="pallas")
        s1_p, s2_p = m_p.apply(v, x)
    finally:
        pba.windowed_attention_image = pba_backup
    np.testing.assert_allclose(np.asarray(s1_p), np.asarray(s1_e),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2_p), np.asarray(s2_e),
                               rtol=1e-4, atol=1e-4)


def test_full_fused_matches_ref(rng):
    from stswincl_tpu.ops.pallas_block_attention import (
        fused_swin_block_attention, fused_swin_block_attention_ref)

    B, T, H, W, C, heads, ws = 1, 2, 8, 12, 32, 2, 4
    TN = T * ws * ws
    N = ws * ws
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.standard_normal(3 * C).astype(np.float32) * 0.1)
    wproj = jnp.asarray(rng.standard_normal((C, C)).astype(np.float32) * 0.1)
    bproj = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    table = rng.standard_normal(((2 * ws - 1) ** 2, heads)).astype(np.float32) * 0.02
    idx = relative_position_index(ws, ws)
    bias = table[idx.reshape(-1)].reshape(N, N, heads).transpose(2, 0, 1)
    bias_tiled = jnp.asarray(np.tile(bias, (1, T, T)))
    m = shifted_window_attention_mask(H, W, ws, 2)
    mask_tiled = jnp.asarray(np.tile(m, (1, T, T)))
    scale = (C // heads) ** -0.5

    got = fused_swin_block_attention(x, wqkv, bqkv, wproj, bproj, bias_tiled,
                                     mask_tiled, heads, scale, ws, 0, True)
    want = fused_swin_block_attention_ref(x, wqkv, bqkv, wproj, bproj,
                                          bias_tiled, mask_tiled, heads,
                                          scale, ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    # grads through the custom vjp
    def loss_k(x, wq, bq, wp, bp):
        return jnp.sum(fused_swin_block_attention(
            x, wq, bq, wp, bp, bias_tiled, mask_tiled, heads, scale, ws,
            0, True) ** 2)

    def loss_r(x, wq, bq, wp, bp):
        return jnp.sum(fused_swin_block_attention_ref(
            x, wq, bq, wp, bp, bias_tiled, mask_tiled, heads, scale, ws) ** 2)

    g0 = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(x, wqkv, bqkv, wproj, bproj)
    g1 = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, wqkv, bqkv, wproj, bproj)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_full_stack_pallas_full_interpret_matches_einsum(rng):
    from stswincl_tpu.models import SwinTemporalStack
    import stswincl_tpu.ops.pallas_block_attention as pba

    x = jnp.asarray(rng.standard_normal((1, 4, 16, 16, 32)).astype(np.float32))
    m_e = SwinTemporalStack(dim=32, input_resolution=(16, 16), num_heads=4,
                            attn_impl="einsum")
    v = m_e.init(jax.random.key(0), x)
    s1_e, s2_e = m_e.apply(v, x)

    orig = pba.fused_swin_block_attention
    forced = (lambda *a, **kw: orig(*a[:11], True))
    pba.fused_swin_block_attention, saved = forced, pba.fused_swin_block_attention
    try:
        m_p = SwinTemporalStack(dim=32, input_resolution=(16, 16),
                                num_heads=4, attn_impl="pallas_full")
        s1_p, s2_p = m_p.apply(v, x)
    finally:
        pba.fused_swin_block_attention = saved
    np.testing.assert_allclose(np.asarray(s1_p), np.asarray(s1_e),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2_p), np.asarray(s2_e),
                               rtol=1e-4, atol=1e-4)


def test_fused_attention_shifted_matches_roll(rng):
    """shift-in-kernel == roll + unshifted kernel (and the ref)."""
    from stswincl_tpu.ops.pallas_block_attention import (
        fused_swin_block_attention, fused_swin_block_attention_ref)

    B, T, H, W, C, heads, ws, ss = 2, 2, 8, 12, 32, 2, 4, 2
    TN = T * ws * ws
    N = ws * ws
    nWin = (H // ws) * (W // ws)
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.standard_normal(3 * C).astype(np.float32) * 0.1)
    wproj = jnp.asarray(rng.standard_normal((C, C)).astype(np.float32) * 0.1)
    bproj = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    table = rng.standard_normal(((2 * ws - 1) ** 2, heads)).astype(np.float32) * 0.02
    idx = relative_position_index(ws, ws)
    bias = table[idx.reshape(-1)].reshape(N, N, heads).transpose(2, 0, 1)
    bias_tiled = jnp.asarray(np.tile(bias, (1, T, T)))
    m = shifted_window_attention_mask(H, W, ws, ss)
    assert m.shape[0] == nWin
    mask_tiled = jnp.asarray(np.tile(m, (1, T, T)))
    scale = (C // heads) ** -0.5

    got = fused_swin_block_attention(x, wqkv, bqkv, wproj, bproj, bias_tiled,
                                     mask_tiled, heads, scale, ws, ss, True)
    xr = jnp.roll(x, (-ss, -ss), axis=(2, 3))
    want = fused_swin_block_attention(xr, wqkv, bqkv, wproj, bproj,
                                      bias_tiled, mask_tiled, heads, scale,
                                      ws, 0, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    want_ref = fused_swin_block_attention_ref(
        x, wqkv, bqkv, wproj, bproj, bias_tiled, mask_tiled, heads, scale,
        ws, ss)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_ref),
                               rtol=1e-4, atol=1e-4)

    # grads through the shifted custom vjp == grads of the rolled ref
    def loss_k(x, wq):
        return jnp.sum(fused_swin_block_attention(
            x, wq, bqkv, wproj, bproj, bias_tiled, mask_tiled, heads, scale,
            ws, ss, True) ** 2)

    def loss_r(x, wq):
        return jnp.sum(fused_swin_block_attention_ref(
            x, wq, bqkv, wproj, bproj, bias_tiled, mask_tiled, heads, scale,
            ws, ss) ** 2)

    g0 = jax.grad(loss_k, argnums=(0, 1))(x, wqkv)
    g1 = jax.grad(loss_r, argnums=(0, 1))(x, wqkv)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_full_stack_shift_in_kernel_matches_einsum(rng, monkeypatch):
    """The roll-free SW-MSA wiring (TPU-only route, forced on here with
    interpreted kernels) must reproduce the einsum stack exactly."""
    from stswincl_tpu.models import SwinTemporalStack
    import stswincl_tpu.ops.pallas_attention as pa
    import stswincl_tpu.ops.pallas_block_attention as pba
    import stswincl_tpu.ops.pallas_add_ln_mlp as palm

    x = jnp.asarray(rng.standard_normal((1, 4, 16, 16, 32)).astype(np.float32))
    m_e = SwinTemporalStack(dim=32, input_resolution=(16, 16), num_heads=4,
                            attn_impl="einsum")
    v = m_e.init(jax.random.key(0), x)
    s1_e, s2_e = m_e.apply(v, x)

    monkeypatch.setattr(pa, "_is_tpu_backend", lambda: True)
    orig_attn = pba.fused_swin_block_attention
    monkeypatch.setattr(pba, "fused_swin_block_attention",
                        lambda *a, **kw: orig_attn(*a[:11], True))
    orig_epi = palm.fused_swin_block_epilogue
    monkeypatch.setattr(palm, "fused_swin_block_epilogue",
                        lambda *a, **kw: orig_epi(*a[:11], 1e-5, True))
    orig_epis = palm.fused_swin_block_epilogue_shifted
    monkeypatch.setattr(palm, "fused_swin_block_epilogue_shifted",
                        lambda *a, **kw: orig_epis(*a[:13], 1e-5, True))

    m_p = SwinTemporalStack(dim=32, input_resolution=(16, 16),
                            num_heads=4, attn_impl="pallas_full")
    s1_p, s2_p = m_p.apply(v, x)
    np.testing.assert_allclose(np.asarray(s1_p), np.asarray(s1_e),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2_p), np.asarray(s2_e),
                               rtol=1e-4, atol=1e-4)


def test_full_bwd_kernel_matches_ref_vjp(rng):
    """`fused_swin_block_attention_bwd` (interpret) == jax.vjp of the
    reference for dx and every weight/bias/relative-bias grad, for both
    the plain (W-MSA) and masked (SW-MSA) cases."""
    from stswincl_tpu.ops.pallas_block_attention import (
        fused_swin_block_attention_bwd, fused_swin_block_attention_ref)

    for with_mask in (False, True):
        B, T, H, W, C, heads, ws = 2, 2, 8, 12, 32, 2, 4
        TN = T * ws * ws
        scale = (C // heads) ** -0.5
        x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(
            np.float32) * 0.3)
        g = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(
            np.float32) * 0.3)
        wqkv = jnp.asarray(
            rng.standard_normal((C, 3 * C)).astype(np.float32) * 0.1)
        bqkv = jnp.asarray(
            rng.standard_normal(3 * C).astype(np.float32) * 0.1)
        wproj = jnp.asarray(
            rng.standard_normal((C, C)).astype(np.float32) * 0.1)
        bproj = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
        bias = jnp.asarray(
            rng.standard_normal((heads, TN, TN)).astype(np.float32) * 0.1)
        if with_mask:
            n_mask = (H // ws) * (W // ws)
            mask = jnp.asarray(
                (rng.random((n_mask, TN, TN)) > 0.7).astype(np.float32)
                * -100.0)
        else:
            mask = jnp.zeros((1, TN, TN), jnp.float32)

        dx, dwqkv, dbqkv, dwproj, dbproj, dbias = \
            fused_swin_block_attention_bwd(
                x, wqkv, bqkv, wproj, bias, mask, g, heads, scale, ws,
                interpret=True)

        _, vjp = jax.vjp(
            lambda a, b, c, d, e, f: fused_swin_block_attention_ref(
                a, b, c, d, e, f, mask, heads, scale, ws, 0),
            x, wqkv, bqkv, wproj, bproj, bias)
        rx, rwqkv, rbqkv, rwproj, rbproj, rbias = vjp(g)

        for got, want, name in [(dx, rx, "dx"), (dwqkv, rwqkv, "dwqkv"),
                                (dbqkv, rbqkv, "dbqkv"),
                                (dwproj, rwproj, "dwproj"),
                                (dbproj, rbproj, "dbproj"),
                                (dbias, rbias, "dbias")]:
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4,
                err_msg=f"{name} (with_mask={with_mask})")


def test_full_fused_grads_route_through_bwd_kernel_shifted(rng):
    """End-to-end: jax.grad through `fused_swin_block_attention` with
    shift>0 (interpret falls back to the ref vjp; this pins the shifted
    contract the TPU kernel route must satisfy)."""
    from stswincl_tpu.ops.pallas_block_attention import (
        fused_swin_block_attention_bwd, fused_swin_block_attention_ref)

    B, T, H, W, C, heads, ws, shift = 1, 2, 8, 12, 32, 2, 4, 2
    TN = T * ws * ws
    scale = (C // heads) ** -0.5
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(
        np.float32) * 0.3)
    g = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(
        np.float32) * 0.3)
    wqkv = jnp.asarray(
        rng.standard_normal((C, 3 * C)).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.standard_normal(3 * C).astype(np.float32) * 0.1)
    wproj = jnp.asarray(rng.standard_normal((C, C)).astype(np.float32) * 0.1)
    bproj = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    bias = jnp.asarray(
        rng.standard_normal((heads, TN, TN)).astype(np.float32) * 0.1)
    n_mask = (H // ws) * (W // ws)
    mask = jnp.asarray(
        (rng.random((n_mask, TN, TN)) > 0.7).astype(np.float32) * -100.0)

    # the TPU route: roll x, run the flat bwd kernel, roll dx back
    xs = jnp.roll(x, (-shift, -shift), axis=(2, 3))
    dx_s, dwqkv, dbqkv, dwproj, dbproj, dbias = \
        fused_swin_block_attention_bwd(
            xs, wqkv, bqkv, wproj, bias, mask, g, heads, scale, ws,
            interpret=True)
    dx = jnp.roll(dx_s, (shift, shift), axis=(2, 3))

    _, vjp = jax.vjp(
        lambda a, b, c, d, e, f: fused_swin_block_attention_ref(
            a, b, c, d, e, f, mask, heads, scale, ws, shift),
        x, wqkv, bqkv, wproj, bproj, bias)
    rx, rwqkv, rbqkv, rwproj, rbproj, rbias = vjp(g)

    for got, want, name in [(dx, rx, "dx"), (dwqkv, rwqkv, "dwqkv"),
                            (dbqkv, rbqkv, "dbqkv"),
                            (dwproj, rwproj, "dwproj"),
                            (dbproj, rbproj, "dbproj"),
                            (dbias, rbias, "dbias")]:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4,
            err_msg=name)


def test_full_fused_band_rows_matches_single_row(rng):
    """band_rows=2 (two window rows per grid cell) must be bit-identical to
    the default one-row kernel — the band size is a scheduling choice, not
    a numerics one. Covers W-MSA (mask=None path uses single_mask) and
    SW-MSA (per-window masks, block = this cell's 2*nW masks) plus the
    in-kernel shift. Comparison is tight-allclose, not bit-equal: XLA:CPU's
    dot reduction order is M-shape-dependent (interpret mode), so the
    band's bigger-M matmuls can differ by ulps."""
    from stswincl_tpu.ops.pallas_block_attention import (
        fused_swin_block_attention, fused_swin_block_attention_ref)

    B, T, H, W, C, heads, ws = 1, 2, 16, 12, 32, 2, 4  # nH=4: br=2 divides
    TN = T * ws * ws
    N = ws * ws
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    wqkv = jnp.asarray(
        rng.standard_normal((C, 3 * C)).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.standard_normal(3 * C).astype(np.float32) * 0.1)
    wproj = jnp.asarray(rng.standard_normal((C, C)).astype(np.float32) * 0.1)
    bproj = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    table = rng.standard_normal(
        ((2 * ws - 1) ** 2, heads)).astype(np.float32) * 0.02
    idx = relative_position_index(ws, ws)
    bias = table[idx.reshape(-1)].reshape(N, N, heads).transpose(2, 0, 1)
    bias_tiled = jnp.asarray(np.tile(bias, (1, T, T)))
    m = shifted_window_attention_mask(H, W, ws, 2)
    mask_tiled = jnp.asarray(np.tile(m, (1, T, T)))
    zeros_mask = jnp.zeros((1, TN, TN), jnp.float32)
    scale = (C // heads) ** -0.5

    for shift, mask in ((0, zeros_mask), (0, mask_tiled), (2, mask_tiled)):
        one = fused_swin_block_attention(
            x, wqkv, bqkv, wproj, bproj, bias_tiled, mask, heads, scale,
            ws, shift, True, 1)
        two = fused_swin_block_attention(
            x, wqkv, bqkv, wproj, bproj, bias_tiled, mask, heads, scale,
            ws, shift, True, 2)
        np.testing.assert_allclose(np.asarray(one), np.asarray(two),
                                   rtol=1e-5, atol=1e-6)
        want = fused_swin_block_attention_ref(
            x, wqkv, bqkv, wproj, bproj, bias_tiled, mask, heads, scale,
            ws, shift)
        np.testing.assert_allclose(np.asarray(two), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    # an nH-indivisible band request silently falls back to 1 row
    fb = fused_swin_block_attention(
        x, wqkv, bqkv, wproj, bproj, bias_tiled, zeros_mask, heads, scale,
        ws, 0, True, 3)
    base = fused_swin_block_attention(
        x, wqkv, bqkv, wproj, bproj, bias_tiled, zeros_mask, heads, scale,
        ws, 0, True, 1)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(base),
                               rtol=1e-5, atol=1e-6)


def test_resolve_band_rows_routing(monkeypatch):
    """Routing table for the band knob: shipped default is 1 (the measured
    r5 winner), env override honored only when nH divides and the qkv
    scratch fits the 24MB VMEM budget."""
    from stswincl_tpu.ops.pallas_block_attention import _resolve_band_rows

    # serving/clip shapes at default -> 1 (the measured best config)
    monkeypatch.delenv("STSWIN_ATTN_BAND_ROWS", raising=False)
    assert _resolve_band_rows(None, nH=8, T=4, ws=8, W=80, C=384, isz=2) == 1

    # env override, divisible + within budget -> honored
    monkeypatch.setenv("STSWIN_ATTN_BAND_ROWS", "2")
    assert _resolve_band_rows(None, nH=8, T=4, ws=8, W=80, C=384, isz=2) == 2

    # explicit arg beats env; indivisible nH falls back to 1
    assert _resolve_band_rows(4, nH=6, T=4, ws=8, W=80, C=384, isz=2) == 1
    assert _resolve_band_rows(2, nH=6, T=4, ws=8, W=80, C=384, isz=2) == 2

    # a band whose qkv scratch exceeds 24MB falls back to 1:
    # T*band*ws*W*3*C*isz = 4*2*8*640*3*1024*4 = 1.5GB >> 24MB
    assert _resolve_band_rows(2, nH=8, T=4, ws=8, W=640, C=1024, isz=4) == 1
