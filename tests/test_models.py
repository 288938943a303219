"""Shape/structure tests for the model zoo."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stswincl_tpu.models import (
    ResNet18OS8,
    SwinTemporalStack,
    ASPP,
    TswinPlus,
    DeepLabV3Plus,
    ContrastEncoder,
)


def test_resnet_os8_shape(rng):
    m = ResNet18OS8()
    x = jnp.asarray(rng.standard_normal((2, 64, 80, 3)).astype(np.float32))
    variables = m.init(jax.random.key(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (2, 8, 10, 512)
    # batch_stats collection exists for every BN
    assert "batch_stats" in variables


def test_resnet_train_mode_updates_stats(rng):
    m = ResNet18OS8()
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    variables = m.init(jax.random.key(0), x, train=False)
    y, updates = m.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["stem"]["bn"]["mean"]
    after = updates["batch_stats"]["stem"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_separable_maxpool_bit_equal(rng, monkeypatch):
    """The stem's separable 3x3/s2/p1 maxpool route (models/resnet.py,
    max_pool_3x3_s2 under STSWIN_SEP_POOL=1 — measured faster standalone
    but slower in-model, so opt-in) is bit-identical to the default 2-D
    reduce_window form — including odd extents where the padded edge
    windows matter and negative values where the -inf pad init is
    load-bearing."""
    import flax.linen as nn
    from stswincl_tpu.models.resnet import max_pool_3x3_s2
    monkeypatch.setenv("STSWIN_SEP_POOL", "1")
    for shape in [(2, 16, 20, 8), (1, 15, 17, 4)]:
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)) - 2.0
        ref = nn.max_pool(x, (3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)))
        got = max_pool_3x3_s2(x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_swin_stack_shapes(rng):
    m = SwinTemporalStack(dim=64, input_resolution=(16, 24), num_heads=4)
    x = jnp.asarray(rng.standard_normal((2, 4, 16, 24, 64)).astype(np.float32))
    variables = m.init(jax.random.key(0), x)
    s1, s2 = m.apply(variables, x)
    assert s1.shape == (2, 4, 16, 24, 64)
    assert s2.shape == (2, 4, 8, 12, 128)


def test_swin_pair_schedule_passthrough(rng):
    """Middle layer only touches frames 1:3 — but layers 0 and 2 touch all
    frames, so by the end every frame depends on the input. Check the
    stage-1 output actually differs per frame (no accidental weight sharing
    collapse) and that a change in frame 0 propagates to frame 3 (temporal
    bridging through the middle layer)."""
    m = SwinTemporalStack(dim=32, input_resolution=(16, 16), num_heads=4)
    x = rng.standard_normal((1, 4, 16, 16, 32)).astype(np.float32)
    variables = m.init(jax.random.key(0), jnp.asarray(x))
    s1a, _ = m.apply(variables, jnp.asarray(x))
    x2 = x.copy()
    x2[0, 0] += 1.0  # perturb frame 0
    s1b, _ = m.apply(variables, jnp.asarray(x2))
    # frame 3 must change: 0 -> pair(0,1) -> mid(1,2) -> pair(2,3)
    delta_f3 = np.abs(np.asarray(s1a[0, 3]) - np.asarray(s1b[0, 3])).max()
    assert delta_f3 > 1e-6


def test_swin_final_pair_only_preserves_last_frame(rng):
    """`final_pair_only` skips the dead (0,2) group of the last stage-2
    layer: stage1 and the consumed stage2 last frame must be unchanged;
    stage2 frames 0-1 become pass-throughs."""
    kw = dict(dim=32, input_resolution=(16, 16), num_heads=4)
    full = SwinTemporalStack(**kw)
    skip = SwinTemporalStack(final_pair_only=True, **kw)
    x = jnp.asarray(rng.standard_normal((2, 4, 16, 16, 32)).astype(np.float32))
    variables = full.init(jax.random.key(0), x)
    s1f, s2f = full.apply(variables, x)
    s1s, s2s = skip.apply(variables, x)
    np.testing.assert_allclose(np.asarray(s1s), np.asarray(s1f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2s[:, -1]), np.asarray(s2f[:, -1]),
                               atol=1e-6)
    # and it really does skip: frames 0-1 differ from the full computation
    assert np.abs(np.asarray(s2s[:, 0]) - np.asarray(s2f[:, 0])).max() > 1e-3


def test_aspp_shape(rng):
    m = ASPP(in_channels=128, out_channels=32)
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 128)).astype(np.float32))
    variables = m.init(jax.random.key(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (2, 8, 10, 32)


@pytest.mark.slow
def test_tswinplus_forward(rng):
    m = TswinPlus(num_classes=12)
    x = jnp.asarray(rng.standard_normal((1, 4, 128, 192, 3)).astype(np.float32))
    variables = m.init(jax.random.key(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (1, 128, 192, 12)
    assert y.dtype == jnp.float32

    feats = m.apply(variables, x, train=False, return_features=True)
    assert feats.shape == (1, 16, 24, 400)


def test_deeplab_baseline(rng):
    m = DeepLabV3Plus(num_classes=12)
    x = jnp.asarray(rng.standard_normal((1, 64, 80, 3)).astype(np.float32))
    variables = m.init(jax.random.key(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (1, 64, 80, 12)


def test_contrast_encoder_normalized(rng):
    m = ContrastEncoder(num_classes=12)
    x = jnp.asarray(rng.standard_normal((1, 4, 128, 192, 3)).astype(np.float32))
    variables = m.init(jax.random.key(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (1, 16, 24, 256)
    norms = np.linalg.norm(np.asarray(y), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


@pytest.mark.slow
def test_remat_grads_match(rng):
    """Block rematerialization must not change gradients."""
    import optax

    x = jnp.asarray(rng.standard_normal((1, 4, 16, 16, 32)).astype(np.float32))
    m0 = SwinTemporalStack(dim=32, input_resolution=(16, 16), num_heads=4)
    m1 = SwinTemporalStack(dim=32, input_resolution=(16, 16), num_heads=4,
                           remat=True)
    v = m0.init(jax.random.key(0), x)

    def loss(mod, params):
        s1, s2 = mod.apply(params, x)
        return jnp.sum(s1 ** 2) + jnp.sum(s2 ** 2)

    g0 = jax.grad(lambda p: loss(m0, p))(v)
    g1 = jax.grad(lambda p: loss(m1, p))(v)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_final_pair_only_grads_match(rng):
    """Training runs `final_pair_only=True` (TswinPlus default): a loss on
    the consumed frames (stage1 last + stage2 last — exactly what the heads
    read) must produce IDENTICAL parameter gradients with and without the
    dead-compute skip, since the skipped work has zero gradient. This
    differentiates through the `out_frame` epilogue restriction of the
    final + penultimate stage-2 layers (depths=(3, 3) default)."""
    x = jnp.asarray(rng.standard_normal((1, 4, 16, 16, 32)).astype(np.float32))
    kw = dict(dim=32, input_resolution=(16, 16), num_heads=4)
    full = SwinTemporalStack(**kw)
    skip = SwinTemporalStack(final_pair_only=True, **kw)
    v = full.init(jax.random.key(0), x)

    def loss(mod, params):
        s1, s2 = mod.apply(params, x)
        return jnp.sum(s1[:, -1] ** 2) + jnp.sum(s2[:, -1] ** 2)

    g0 = jax.grad(lambda p: loss(full, p))(v)
    g1 = jax.grad(lambda p: loss(skip, p))(v)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_remat_with_final_pair_only(rng):
    """remat + final_pair_only compose: `out_frame` is a static slice bound,
    so the checkpoint wrapper must not trace it (static_argnums)."""
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 16)).astype(np.float32))
    m = SwinTemporalStack(dim=16, input_resolution=(8, 8), num_heads=2,
                          remat=True, final_pair_only=True)
    v = m.init(jax.random.key(0), x)

    def loss(p):
        s1, s2 = m.apply(p, x)
        return jnp.sum(s1[:, -1] ** 2) + jnp.sum(s2[:, -1] ** 2)

    g = jax.grad(loss)(v)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
