"""Fused conv3x3+BN+residual+ReLU kernel (benchmark artifact, unrouted —
see the module docstring's negative result): interpret-mode parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stswincl_tpu.ops import pallas_conv


def _xla_ref(x, w, scale, shift, dilation, relu, residual):
    pad = dilation
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y * scale + shift
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y


@pytest.mark.parametrize("dilation", [1, 2, 4])
def test_conv_kernel_matches_xla(rng, dilation):
    N, H, W, C = 2, 16, 32, 128
    x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.05)
    scale = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1 + 1.0)
    shift = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    res = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))

    for relu, residual in [(True, None), (False, None), (True, res)]:
        got = pallas_conv.conv3x3_bn_act(
            x, w, scale, shift, dilation=dilation, relu=relu,
            residual=residual, interpret=True)
        want = _xla_ref(x, w, scale, shift, dilation, relu, residual)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_supports_envelope():
    assert pallas_conv.supports((4, 64, 80, 512), (3, 3, 512, 512), 4, 1)
    assert pallas_conv.supports((4, 64, 80, 256), (3, 3, 256, 256), 2, 1)
    # stride / kernel / channel misfit
    assert not pallas_conv.supports((4, 64, 80, 512), (3, 3, 512, 512), 1, 2)
    assert not pallas_conv.supports((4, 64, 80, 512), (1, 1, 512, 512), 1, 1)
    assert not pallas_conv.supports((4, 64, 80, 64), (3, 3, 64, 64), 1, 1)
    # odd H that no tile divides
    assert not pallas_conv.supports((4, 63, 80, 512), (3, 3, 512, 512), 4, 1)


def test_fold_bn():
    gamma = jnp.asarray([2.0, 1.0])
    beta = jnp.asarray([0.5, -0.5])
    mean = jnp.asarray([1.0, 2.0])
    var = jnp.asarray([4.0, 1.0])
    scale, shift = pallas_conv.fold_bn(gamma, beta, mean, var, eps=0.0)
    x = jnp.asarray([[3.0, 3.0]])
    np.testing.assert_allclose(
        np.asarray(x * scale + shift),
        np.asarray((x - mean) / jnp.sqrt(var) * gamma + beta), rtol=1e-6)


def test_basicblock_epilogue_equivalence(rng):
    """The kernel's fused epilogue (conv+BN -> +residual -> ReLU) matches a
    BasicBlock-shaped composition of two calls, as a would-be router would
    wire it (the kernel is currently unrouted — negative result)."""
    C = 128
    x = jnp.asarray(rng.standard_normal((1, 16, 16, C)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * .05)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * .05)
    s = jnp.ones((C,), jnp.float32)
    b = jnp.zeros((C,), jnp.float32)

    mid = pallas_conv.conv3x3_bn_act(x, w1, s, b, dilation=2, relu=True,
                                     interpret=True)
    got = pallas_conv.conv3x3_bn_act(mid, w2, s, b, dilation=2, relu=True,
                                     residual=x, interpret=True)
    mid_ref = _xla_ref(x, w1, s, b, 2, True, None)
    want = _xla_ref(mid_ref, w2, s, b, 2, True, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
