"""Fused add+LayerNorm: interpret parity, grads, and block equivalence."""

import numpy as np
import jax
import jax.numpy as jnp

from stswincl_tpu.ops.pallas_add_layernorm import (
    fused_add_layer_norm, add_layer_norm_ref)


def test_forward_matches_ref(rng):
    x = jnp.asarray(rng.standard_normal((3, 64, 96)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((3, 64, 96)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(96).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(96).astype(np.float32))
    s, n = fused_add_layer_norm(x, y, scale, bias, 1e-5, True, True)
    s_ref, n_ref = add_layer_norm_ref(x, y, scale, bias)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(n), np.asarray(n_ref),
                               rtol=1e-5, atol=1e-5)
    none_s, n2 = fused_add_layer_norm(x, y, scale, bias, 1e-5, False, True)
    assert none_s is None
    np.testing.assert_allclose(np.asarray(n2), np.asarray(n_ref),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_ref(rng):
    x = jnp.asarray(rng.standard_normal((2, 32, 48)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 32, 48)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(48).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(48).astype(np.float32))

    def loss_f(x, y, s, b):
        su, n = fused_add_layer_norm(x, y, s, b, 1e-5, True, True)
        return jnp.sum(n ** 2) + 0.5 * jnp.sum(su ** 2)

    def loss_r(x, y, s, b):
        su, n = add_layer_norm_ref(x, y, s, b)
        return jnp.sum(n ** 2) + 0.5 * jnp.sum(su.astype(jnp.float32) ** 2)

    g0 = jax.grad(loss_f, argnums=(0, 1, 2, 3))(x, y, scale, bias)
    g1 = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, y, scale, bias)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    # norm-only variant grads
    def loss_f2(x, y, s, b):
        _, n = fused_add_layer_norm(x, y, s, b, 1e-5, False, True)
        return jnp.sum(n ** 2)

    def loss_r2(x, y, s, b):
        _, n = add_layer_norm_ref(x, y, s, b)
        return jnp.sum(n ** 2)

    g0 = jax.grad(loss_f2, argnums=(0, 1, 2, 3))(x, y, scale, bias)
    g1 = jax.grad(loss_r2, argnums=(0, 1, 2, 3))(x, y, scale, bias)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_block_with_fused_ln_matches_flax_path(rng):
    """Force the TPU branch (interpret-mode kernels) and compare to the flax
    LayerNorm path on identical params."""
    from stswincl_tpu.models import SwinTemporalStack
    import stswincl_tpu.ops.pallas_attention as pa
    import stswincl_tpu.ops.pallas_add_layernorm as paln
    import stswincl_tpu.ops.pallas_mlp as pm

    x = jnp.asarray(rng.standard_normal((1, 4, 16, 16, 32)).astype(np.float32))
    m = SwinTemporalStack(dim=32, input_resolution=(16, 16), num_heads=4,
                          attn_impl="einsum")
    v = m.init(jax.random.key(0), x)
    s1_e, s2_e = m.apply(v, x)

    import stswincl_tpu.ops.pallas_add_ln_mlp as pam

    orig_epi = pam.fused_swin_block_epilogue
    epi_calls = []

    def forced_epi(x, y, s2, b2, w1, b1, w2, bw2, s1, b1n, gelu_exact=True,
                   eps=1e-5, interpret=False):
        epi_calls.append(1)
        return orig_epi(x, y, s2, b2, w1, b1, w2, bw2, s1, b1n, gelu_exact,
                        eps, True)

    saved_backend = pa._is_tpu_backend
    pam.fused_swin_block_epilogue = forced_epi
    pa._is_tpu_backend = lambda: True
    try:
        # attn stays einsum (explicit); the whole post-attention tail takes
        # the single fused epilogue kernel
        s1_p, s2_p = m.apply(v, x)
    finally:
        pam.fused_swin_block_epilogue = orig_epi
        pa._is_tpu_backend = saved_backend
    assert len(epi_calls) == 12   # one fused epilogue per block
    np.testing.assert_allclose(np.asarray(s1_p), np.asarray(s1_e),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2_p), np.asarray(s2_e),
                               rtol=1e-4, atol=1e-4)
