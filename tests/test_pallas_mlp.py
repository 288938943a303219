"""Fused MLP kernel: interpret parity + grads + block routing proof."""

import numpy as np
import jax
import jax.numpy as jnp

from stswincl_tpu.ops.pallas_mlp import fused_mlp, mlp_ref


def _params(rng, C=64, hidden=256):
    x = jnp.asarray(rng.standard_normal((2, 48, C)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((C, hidden)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal(hidden).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.standard_normal((hidden, C)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.05)
    return x, w1, b1, w2, b2


def test_forward_matches_ref(rng):
    x, w1, b1, w2, b2 = _params(rng)
    for exact in (True, False):
        got = fused_mlp(x, w1, b1, w2, b2, exact, True)
        want = mlp_ref(x.reshape(-1, 64), w1, b1, w2, b2, exact).reshape(x.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_hidden_blocking(rng):
    # hidden 512 with block 256/512 -> multiple accumulation steps
    x, w1, b1, w2, b2 = _params(rng, C=32, hidden=512)
    got = fused_mlp(x, w1, b1, w2, b2, True, True)
    want = mlp_ref(x.reshape(-1, 32), w1, b1, w2, b2, True).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_grads_match_ref(rng):
    x, w1, b1, w2, b2 = _params(rng, C=32, hidden=128)

    def loss_f(*a):
        return jnp.sum(fused_mlp(*a, True, True) ** 2)

    def loss_r(x, w1, b1, w2, b2):
        return jnp.sum(mlp_ref(x.reshape(-1, 32), w1, b1, w2, b2, True) ** 2)

    g0 = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g1 = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_mlp_module_routes_fused_kernel(rng):
    """The standalone Mlp module (off-block consumer surface) routes to
    fused_mlp under a TPU backend and matches the flax path. (The swin
    block now fuses the MLP with its add+LN prologue instead —
    tests/test_pallas_add_ln_mlp.py / test_add_layernorm.py.)"""
    from stswincl_tpu.models.swin import Mlp
    import stswincl_tpu.ops.pallas_attention as pa
    import stswincl_tpu.ops.pallas_mlp as pm

    x = jnp.asarray(rng.standard_normal((2, 48, 32)).astype(np.float32))
    m = Mlp(hidden=128, out=32)
    v = m.init(jax.random.key(0), x)
    want = m.apply(v, x)

    mlp_calls = []
    orig_mlp = pm.fused_mlp

    def forced_mlp(x, w1, b1, w2, b2, gelu_exact=True, interpret=False):
        mlp_calls.append(1)
        return orig_mlp(x, w1, b1, w2, b2, gelu_exact, True)

    saved = pa._is_tpu_backend
    pm.fused_mlp = forced_mlp
    pa._is_tpu_backend = lambda: True
    try:
        got = m.apply(v, x)
    finally:
        pm.fused_mlp = orig_mlp
        pa._is_tpu_backend = saved
    assert len(mlp_calls) == 1
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fast_erf_accuracy_and_grad():
    """The divide/exp-free erf polynomial (the default in-kernel erf) must
    stay within its fitted bound of true erf, and its hand-written
    derivative must equal jax.grad of the approximation (the backward
    kernels rely on that identity)."""
    import math
    from stswincl_tpu.ops.pallas_mlp import (_erf_poly_fast,
                                             _erf_poly_fast_grad)

    x = jnp.asarray(np.linspace(-6.0, 6.0, 4001), jnp.float32)
    got = np.asarray(_erf_poly_fast(x))
    want = np.vectorize(math.erf)(np.asarray(x))
    assert np.abs(got - want).max() < 4e-5
    # the saturated tail is EXACTLY +-1: GELU's dead negative tail stays
    # dead (0.5*x*(1+erf) == 0 for x < -3*sqrt(2)) instead of growing
    # linearly with |x| times the fit error
    assert got[0] == -1.0 and got[-1] == 1.0

    g_hand = np.asarray(_erf_poly_fast_grad(x))
    g_auto = np.asarray(jax.vmap(jax.grad(_erf_poly_fast))(x))
    # near the clamp the combination P + 2tP' nearly cancels (grad ~2e-3)
    # and the two evaluation orders differ at fp32 roundoff — compare at
    # cancellation-aware tolerance
    np.testing.assert_allclose(g_hand, g_auto, rtol=2e-3, atol=5e-6)


def test_fast_erf_gelu_bf16_drift_bounded():
    """bf16 GELU outputs under the fast erf differ from the A&S form by at
    most ~1 ulp on a small fraction of elements."""
    import os
    from stswincl_tpu.ops.pallas_mlp import _gelu

    x = jnp.asarray(np.linspace(-8.0, 8.0, 8001), jnp.float32)
    prior = os.environ.get("STSWIN_FAST_ERF")
    try:
        os.environ["STSWIN_FAST_ERF"] = "1"
        fast = np.asarray(_gelu(x, True).astype(jnp.bfloat16),
                          dtype=np.float32)
        os.environ["STSWIN_FAST_ERF"] = "0"
        slow = np.asarray(_gelu(x, True).astype(jnp.bfloat16),
                          dtype=np.float32)
    finally:
        if prior is None:
            os.environ.pop("STSWIN_FAST_ERF", None)
        else:
            os.environ["STSWIN_FAST_ERF"] = prior
    diff = np.abs(fast - slow)
    # ~1 bf16 ulp (up to 2^-7 of the value just above a power of two),
    # with a 6e-5 absolute floor: the saturated tail truncates true GELU
    # values of up to ~4.6e-5 (at |x| ~ 3*sqrt(2)) to an exact 0 —
    # measured and accepted (these are dead activations)
    tol = 2.0 ** -7 * np.abs(slow) + 6e-5
    assert (diff <= tol).all()
    assert np.mean(diff > 0) < 0.25  # the bulk stays bitwise identical
