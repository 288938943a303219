"""Fused PatchMerging kernel: interpret-mode parity, grads, model routing.

Reference semantics: `swin_512.py:239-277` (2x2 space-to-depth + LayerNorm
+ bias-free Linear 4C -> 2C).
"""

import numpy as np
import jax
import jax.numpy as jnp

from stswincl_tpu.ops.pallas_patch_merge import (
    fused_patch_merge, patch_merge_ref, patch_merge_applicable)


def _case(rng, BT=3, H=16, W=32, C=128, dtype=jnp.bfloat16):
    x = jnp.asarray(rng.standard_normal((BT, H, W, C)), dtype)
    scale = jnp.asarray(rng.standard_normal(4 * C), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(4 * C), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4 * C, 2 * C)) * 0.05, jnp.float32)
    return x, scale, bias, w


def test_kernel_matches_ref(rng):
    x, scale, bias, w = _case(rng)
    got = np.asarray(fused_patch_merge(x, scale, bias, w, 1e-5, True),
                     dtype=np.float32)
    want = np.asarray(patch_merge_ref(x, scale, bias, w), dtype=np.float32)
    # same math modulo fp32 partial-sum order: the kernel accumulates the
    # matmul as two 2C-contraction dots (and the LN moments as two chunk
    # sums) where the ref contracts 4C in one dot — near-tie elements can
    # round one bf16 ulp apart (measured 7/98304 at this case)
    np.testing.assert_allclose(got, want, rtol=1.5e-2, atol=1.5e-3)
    exact = np.mean(got == want)
    assert exact > 0.999, f"only {exact:.4%} bitwise-equal"


def test_kernel_matches_ref_fp32(rng):
    x, scale, bias, w = _case(rng, BT=2, H=8, W=16, C=128,
                              dtype=jnp.float32)
    got = np.asarray(fused_patch_merge(x, scale, bias, w, 1e-5, True))
    want = np.asarray(patch_merge_ref(x, scale, bias, w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ref_matches_flax_path(rng):
    """patch_merge_ref must reproduce the flax concat->LayerNorm->Dense
    lowering this kernel replaces (the custom-vjp backward math)."""
    import flax.linen as nn

    x, scale, bias, w = _case(rng, BT=2, H=8, W=16, C=128)
    BT, H, W_, C = x.shape

    class Flax(nn.Module):
        @nn.compact
        def __call__(self, xi):
            x0 = xi[:, 0::2, 0::2, :]
            x1 = xi[:, 1::2, 0::2, :]
            x2 = xi[:, 0::2, 1::2, :]
            x3 = xi[:, 1::2, 1::2, :]
            xc = jnp.concatenate([x0, x1, x2, x3], axis=-1)
            xc = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16,
                              name="norm")(xc)
            return nn.Dense(2 * C, use_bias=False, dtype=jnp.bfloat16,
                            name="reduction")(xc)

    m = Flax()
    variables = {"params": {"norm": {"scale": scale, "bias": bias},
                            "reduction": {"kernel": w}}}
    want = np.asarray(m.apply(variables, x), dtype=np.float32)
    got = np.asarray(patch_merge_ref(x, scale, bias, w), dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_grads_match_ref(rng):
    x, scale, bias, w = _case(rng, BT=2, H=8, W=16, C=128)

    def f(x, s, b, w):
        return jnp.sum(
            fused_patch_merge(x, s, b, w, 1e-5, True).astype(jnp.float32))

    def fr(x, s, b, w):
        return jnp.sum(patch_merge_ref(x, s, b, w).astype(jnp.float32))

    got = jax.grad(f, argnums=(0, 1, 2, 3))(x, scale, bias, w)
    want = jax.grad(fr, argnums=(0, 1, 2, 3))(x, scale, bias, w)
    for g, r in zip(got, want):
        np.testing.assert_array_equal(
            np.asarray(g, dtype=np.float32), np.asarray(r, dtype=np.float32))


def test_vmap_forward(rng):
    """The forward-only key pass vmaps the encoder (train_contrast.
    make_key_pass) — the kernel's batching path must stay correct."""
    x, scale, bias, w = _case(rng, BT=2, H=8, W=16, C=128)
    xs = jnp.stack([x, x * 0.5])
    got = jax.vmap(
        lambda xi: fused_patch_merge(xi, scale, bias, w, 1e-5, True))(xs)
    want = jnp.stack([patch_merge_ref(x, scale, bias, w),
                      patch_merge_ref(x * 0.5, scale, bias, w)])
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(want, dtype=np.float32),
        rtol=1.5e-2, atol=1.5e-3)


def test_applicable_predicate(rng):
    x, *_ = _case(rng)
    # CPU backend in the suite: routing must stay off (flax path)
    assert not patch_merge_applicable(x)


def test_model_param_tree_unchanged(rng):
    """The fused path declares params through holders that mirror the flax
    names — the variable tree must be identical either way (checkpoints,
    torch import)."""
    from stswincl_tpu.models.swin import PatchMerging

    m = PatchMerging((8, 16), 64, dtype=jnp.bfloat16)
    x = jnp.zeros((2, 2, 8 * 16, 64), jnp.bfloat16)
    v = m.init(jax.random.key(0), x)
    params = v["params"]
    assert set(params.keys()) == {"norm", "reduction"}
    assert set(params["norm"].keys()) == {"scale", "bias"}
    assert set(params["reduction"].keys()) == {"kernel"}
    assert params["reduction"]["kernel"].shape == (256, 128)
