"""Fused LayerNorm: interpret-mode parity vs torch and grads vs XLA math."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from stswincl_tpu.ops.pallas_layernorm import (
    fused_layer_norm, _xla_layer_norm)


def test_forward_matches_torch(rng):
    x = rng.standard_normal((6, 128, 96)).astype(np.float32)
    scale = rng.standard_normal(96).astype(np.float32)
    bias = rng.standard_normal(96).astype(np.float32)
    got = fused_layer_norm(jnp.asarray(x), jnp.asarray(scale),
                           jnp.asarray(bias), 1e-5, True)
    ln = torch.nn.LayerNorm(96, eps=1e-5)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(scale))
        ln.bias.copy_(torch.from_numpy(bias))
        want = ln(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_forward_odd_rows(rng):
    # row count not divisible by 256: kernel tile fallback
    x = rng.standard_normal((3, 40, 64)).astype(np.float32)
    scale = np.ones(64, np.float32)
    bias = np.zeros(64, np.float32)
    got = fused_layer_norm(jnp.asarray(x), jnp.asarray(scale),
                           jnp.asarray(bias), 1e-5, True)
    want = _xla_layer_norm(jnp.asarray(x), jnp.asarray(scale),
                           jnp.asarray(bias), 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_xla(rng):
    x = jnp.asarray(rng.standard_normal((4, 64, 32)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(32).astype(np.float32))

    def loss_fused(x, s, b):
        return jnp.sum(fused_layer_norm(x, s, b, 1e-5, True) ** 2)

    def loss_xla(x, s, b):
        return jnp.sum(_xla_layer_norm(x, s, b, 1e-5) ** 2)

    g0 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g1 = jax.grad(loss_xla, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
