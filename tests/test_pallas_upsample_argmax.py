"""Fused upsample+argmax kernel: interpret-mode parity with the XLA path."""

import numpy as np
import jax.numpy as jnp

from stswincl_tpu.ops.pallas_upsample_argmax import (
    fits_pallas_route, upsample_argmax_pallas)
from stswincl_tpu.ops.resize import (
    _align_corners_matrix, _half_pixel_matrix, upsample_argmax)


def _bf16_ref(x_cf, mh, mw):
    """Mirror of the kernel's math (bf16 matmul inputs, fp32 accumulation,
    first-index ties) through plain jnp — the exactness oracle."""
    xb = x_cf.astype(jnp.bfloat16).astype(jnp.float32)
    mhb = mh.astype(jnp.bfloat16).astype(jnp.float32)
    mwb = mw.astype(jnp.bfloat16).astype(jnp.float32)
    t = jnp.einsum("oh,bchw->bcow", mhb, xb)
    t = t.astype(jnp.bfloat16).astype(jnp.float32)
    y = jnp.einsum("pw,bcow->bcop", mwb, t)
    return jnp.argmax(y, axis=1).astype(jnp.int32)


def test_kernel_matches_bf16_einsum_exactly(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 16, 24)).astype(np.float32))
    for mat in (_align_corners_matrix, _half_pixel_matrix):
        mh = mat(16, 32).astype(jnp.float32)
        mw = mat(24, 48).astype(jnp.float32)
        got = upsample_argmax_pallas(x, mh, mw, interpret=True)
        want = _bf16_ref(x, mh, mw)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_kernel_close_to_f32_path(rng):
    """Against the f32 XLA path the only divergence is bf16 rounding at
    near-ties; on random logits the disagreement must be rare."""
    x = jnp.asarray(rng.standard_normal((2, 5, 16, 24)).astype(np.float32))
    mh = _align_corners_matrix(16, 32).astype(jnp.float32)
    mw = _align_corners_matrix(24, 48).astype(jnp.float32)
    got = np.asarray(upsample_argmax_pallas(x, mh, mw, interpret=True))
    xf = jnp.einsum("pw,bcow->bcop", mw, jnp.einsum("oh,bchw->bcow", mh, x))
    want = np.asarray(jnp.argmax(xf, axis=1))
    assert (got == want).mean() > 0.99


def test_tie_break_takes_first_class(rng):
    # two identical class planes -> argmax must pick class 0 everywhere
    plane = rng.standard_normal((1, 1, 8, 16)).astype(np.float32)
    x = jnp.asarray(np.concatenate([plane, plane], axis=1))
    mh = _align_corners_matrix(8, 16).astype(jnp.float32)
    mw = _align_corners_matrix(16, 32).astype(jnp.float32)
    got = np.asarray(upsample_argmax_pallas(x, mh, mw, interpret=True))
    assert (got == 0).all()


def test_routing_guard():
    # EndoVis eval shape fits; an absurd width does not; downsampling never
    assert fits_pallas_route(8, 12, 512, 640, 1024, 1280)
    assert not fits_pallas_route(8, 12, 512, 640, 1024, 1280,
                                 budget_bytes=2 ** 20)
    assert not fits_pallas_route(8, 12, 512, 640, 256, 320)


def test_upsample_argmax_entry_unchanged_on_cpu(rng):
    # the public entry still takes NHWC and routes to the XLA path here
    x = jnp.asarray(rng.standard_normal((2, 16, 20, 5)).astype(np.float32))
    out = upsample_argmax(x, 32, 40, align_corners=True)
    assert out.shape == (2, 32, 40) and out.dtype == jnp.int32


def test_composed_matches_two_step_chain(rng):
    """M2@(M1@x) == (M2@M1)@x: the composed single-resize argmax must equal
    the reference protocol's explicit chain (model half-pixel upsample to
    input res `base18.py:106`, then align-corners resize to scoring res
    `seg18/test.py:155`, then argmax)."""
    from stswincl_tpu.ops.resize import (
        composed_upsample_argmax_cf, resize_bilinear_cf_matmul)

    lcf = jnp.asarray(rng.standard_normal((2, 5, 8, 10)).astype(np.float32))
    got = composed_upsample_argmax_cf(lcf, (32, 40), (64, 80),
                                      align_out=True)
    mid = resize_bilinear_cf_matmul(lcf, 32, 40)          # half-pixel
    mh = _align_corners_matrix(32, 64).astype(jnp.float32)
    mw = _align_corners_matrix(40, 80).astype(jnp.float32)
    full = jnp.einsum("pw,bcow->bcop", mw,
                      jnp.einsum("oh,bchw->bcow", mh, mid))
    want = jnp.argmax(full, axis=1).astype(jnp.int32)
    assert got.shape == (2, 64, 80)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_model_head_res_fast_path_matches_legacy(rng):
    """TswinPlus(head_res_logits=True) + composed resize+argmax must
    reproduce the legacy eval path (full NHWC logits -> upsample_argmax)."""
    import jax
    from stswincl_tpu.models import TswinPlus
    from stswincl_tpu.ops.resize import composed_upsample_argmax_cf

    model = TswinPlus(num_classes=5, swin_dim=64)
    x = jnp.asarray(rng.standard_normal((1, 4, 32, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)

    logits = model.apply(variables, x, train=False)
    want = upsample_argmax(logits, 64, 128, align_corners=True)

    lcf = model.apply(variables, x, train=False, head_res_logits=True)
    got = composed_upsample_argmax_cf(lcf, (32, 64), (64, 128),
                                      align_out=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_deeplab_head_res_fast_path_matches_legacy(rng):
    import jax
    from stswincl_tpu.models.stswin import DeepLabV3Plus
    from stswincl_tpu.ops.resize import composed_upsample_argmax_cf

    model = DeepLabV3Plus(num_classes=5, width=16)
    x = jnp.asarray(rng.standard_normal((1, 32, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)

    logits = model.apply(variables, x, train=False)
    want = upsample_argmax(logits, 64, 128, align_corners=True)

    lcf = model.apply(variables, x, train=False, head_res_logits=True)
    got = composed_upsample_argmax_cf(lcf, (32, 64), (64, 128),
                                      align_out=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_exact_mode_matches_f32_path_exactly(rng):
    """exact=True keeps logits and interpolation matrices fp32 end-to-end:
    the kernel must agree with the f32 XLA einsum path on EVERY pixel,
    including near-ties the bf16 default can flip (round-4 advisor
    finding: fp32-protocol parity runs need this opt-out)."""
    x = jnp.asarray(rng.standard_normal((2, 5, 16, 24)).astype(np.float32))
    for mat in (_align_corners_matrix, _half_pixel_matrix):
        mh = mat(16, 32).astype(jnp.float32)
        mw = mat(24, 48).astype(jnp.float32)
        got = np.asarray(
            upsample_argmax_pallas(x, mh, mw, interpret=True, exact=True))
        t = jnp.einsum("oh,bchw->bcow", mh, x)
        y = jnp.einsum("pw,bcow->bcop", mw, t)
        want = np.asarray(jnp.argmax(y, axis=1).astype(jnp.int32))
        np.testing.assert_array_equal(got, want)


def test_exact_routing_budget_doubles():
    # a budget that admits the bf16 working set but not the fp32 one
    assert fits_pallas_route(8, 12, 512, 640, 1024, 1280)
    bf16_ok = fits_pallas_route(8, 12, 512, 640, 1024, 1280,
                                budget_bytes=24 * 2 ** 20)
    f32_ok = fits_pallas_route(8, 12, 512, 640, 1024, 1280,
                               budget_bytes=24 * 2 ** 20, exact=True)
    assert bf16_ok and not f32_ok
