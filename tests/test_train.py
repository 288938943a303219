"""Train-step mechanics tests (tiny stand-in models for speed) + sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from stswincl_tpu.train import (
    SegTrainState,
    make_seg_train_step,
    make_seg_eval_step,
    ContrastTrainState,
    make_contrast_train_step,
    contrast_momentum,
    make_adam,
    make_sgd,
    make_lars,
    warmup_cosine_schedule,
    poly_schedule,
)
from stswincl_tpu.parallel import make_mesh, shard_batch, replicate


class TinySeg(nn.Module):
    """Minimal clip->logits model with BN, same interface as TswinPlus."""

    num_classes: int = 5

    @nn.compact
    def __call__(self, x, train=False, return_features=False):
        B, T, H, W, C = x.shape
        h = x[:, -1]  # last frame
        h = nn.Conv(16, (3, 3), padding="SAME")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.relu(h)
        if return_features:
            return h
        return nn.Conv(self.num_classes, (1, 1))(h)


class TinyContrast(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        feat = TinySeg(num_classes=5, name="segmentor")(
            x, train=train, return_features=True)
        proj = nn.Conv(8, (1, 1), name="projector")(feat)
        # downsample to a small "feature resolution"
        proj = nn.avg_pool(proj, (4, 4), strides=(4, 4))
        n = jnp.sqrt(jnp.sum(proj * proj, -1, keepdims=True))
        return proj / jnp.maximum(n, 1e-12)


def _seg_batch(rng, b=4, t=2, h=16, w=16, c=5):
    images = jnp.asarray(rng.standard_normal((b, t, h, w, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, c, size=(b, h, w)).astype(np.int32))
    return images, labels


def test_seg_train_step_learns(rng):
    model = TinySeg()
    images, labels = _seg_batch(rng)
    variables = model.init(jax.random.key(0), images, train=False)
    tx = make_adam(3e-2)
    state = SegTrainState.create(variables, tx)
    step = make_seg_train_step(model, tx, loss_type="ce")
    losses = []
    for _ in range(100):
        state, metrics = step(state, images, labels)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.75  # memorizing random labels is slow
    assert losses[-1] < min(losses[:10])  # but monotone-ish improvement
    assert int(state.step) == 100


def test_seg_train_step_ohem(rng):
    model = TinySeg()
    images, labels = _seg_batch(rng)
    variables = model.init(jax.random.key(0), images, train=False)
    tx = make_sgd(poly_schedule(1e-2, 100), momentum=0.9, weight_decay=1e-4)
    state = SegTrainState.create(variables, tx)
    step = make_seg_train_step(model, tx, loss_type="ohem")
    state, m1 = step(state, images, labels)
    state, m2 = step(state, images, labels)
    assert np.isfinite(float(m1["loss"])) and float(m2["loss"]) < float(m1["loss"]) * 1.5


def test_seg_eval_step(rng):
    model = TinySeg()
    images, labels = _seg_batch(rng)
    variables = model.init(jax.random.key(0), images, train=False)
    ev = make_seg_eval_step(model, out_hw=(32, 32), head_res_logits=False)
    pred = ev(variables["params"], variables["batch_stats"], images)
    assert pred.shape == (4, 32, 32)
    assert pred.dtype == jnp.int32


def test_contrast_train_step(rng):
    model = TinyContrast()
    clips = jnp.asarray(
        rng.standard_normal((2, 6, 2, 16, 16, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, size=(2, 6, 16, 16)).astype(np.int32))
    variables = model.init(jax.random.key(0), clips[:, 0], train=False)
    tx = make_lars(warmup_cosine_schedule(0.1, 10, 100))
    state = ContrastTrainState.create(variables, tx)
    step = make_contrast_train_step(model, tx, class_num=5, total_steps=100)

    p_q0 = jax.tree.leaves(state.params_q)[0].copy()
    state, metrics = step(state, clips, labels)
    assert np.isfinite(float(metrics["loss"]))
    # query params moved; key params EMA'd toward query
    assert not np.allclose(np.asarray(jax.tree.leaves(state.params_q)[0]), p_q0)
    state2, m2 = step(state, clips, labels)
    k_leaf = np.asarray(jax.tree.leaves(state2.params_k)[0])
    q_leaf = np.asarray(jax.tree.leaves(state2.params_q)[0])
    assert not np.allclose(k_leaf, q_leaf)  # EMA lags


def test_contrast_step_remat_matches_no_remat(rng):
    """`remat_queries` (the default — see the device-fault note in
    make_contrast_train_step) must not change the step: same loss, same
    updated params, bitwise."""
    model = TinyContrast()
    clips = jnp.asarray(
        rng.standard_normal((2, 6, 2, 16, 16, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, size=(2, 6, 16, 16)).astype(np.int32))
    variables = model.init(jax.random.key(0), clips[:, 0], train=False)
    tx = make_lars(warmup_cosine_schedule(0.1, 10, 100))
    outs = []
    for remat in (True, False):
        state = ContrastTrainState.create(variables, tx)
        step = make_contrast_train_step(model, tx, class_num=5,
                                        total_steps=100,
                                        remat_queries=remat)
        state, metrics = step(state, clips, labels)
        outs.append((state, metrics))
    (s1, m1), (s2, m2) = outs
    assert float(m1["loss"]) == float(m2["loss"])
    for a, b in zip(jax.tree.leaves(s1.params_q), jax.tree.leaves(s2.params_q)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_contrast_step_scan_matches_unrolled(rng):
    """query_mode='scan' (the TPU default: sequential accumulated per-view
    grads, one backward residual set live at a time) must reproduce the
    joint two-view backward: identical loss, grads equal by linearity
    (grad(l1+l2) = grad(l1) + grad(l2); only fp32 summation order can
    differ)."""
    model = TinyContrast()
    clips = jnp.asarray(
        rng.standard_normal((2, 6, 2, 16, 16, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, size=(2, 6, 16, 16)).astype(np.int32))
    variables = model.init(jax.random.key(0), clips[:, 0], train=False)
    tx = make_lars(warmup_cosine_schedule(0.1, 10, 100))
    outs = []
    for mode in ("scan", "unrolled"):
        state = ContrastTrainState.create(variables, tx)
        step = make_contrast_train_step(model, tx, class_num=5,
                                        total_steps=100, query_mode=mode)
        state, metrics = step(state, clips, labels)
        outs.append((state, metrics))
    (s1, m1), (s2, m2) = outs
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params_q),
                    jax.tree.leaves(s2.params_q)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    # the BN stats EMA chain is order-identical (same fold)
    for a, b in zip(jax.tree.leaves(s1.stats_q), jax.tree.leaves(s2.stats_q)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_key_pass_parallel_matches_sequential(rng):
    """The vmapped key pass must reproduce the reference-ordered
    sequential scan exactly: identical view outputs (train-mode BN never
    reads the running-stats carry) and identical final running stats (the
    zero-stats trick + 6-step fold re-creates flax's EMA arithmetic term
    for term). Uses the REAL ContrastEncoder so every BN in the family is
    covered."""
    from stswincl_tpu.models import ContrastEncoder
    from stswincl_tpu.train.train_contrast import (
        make_key_pass, make_key_pass_sequential)

    model = ContrastEncoder(num_classes=5, swin_dim=64)
    clips = jnp.asarray(
        rng.standard_normal((2, 6, 4, 32, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), clips[:, 0], train=False)
    params, stats = variables["params"], variables["batch_stats"]
    # drive one sequential pass first so the running stats are non-trivial
    _, stats = make_key_pass_sequential(model)(params, stats, clips)

    keys_s, ns_s = jax.jit(make_key_pass_sequential(model))(
        params, stats, clips)
    keys_p, ns_p = jax.jit(make_key_pass(model))(params, stats, clips)
    # tolerance = fp-association drift between the two compiled programs
    # (batched vs looped convs); a semantics bug (cross-view batch-stat
    # contamination, wrong chain order) would show as O(1e-2)+ differences
    for a, b in zip(jax.tree.leaves(keys_s), jax.tree.leaves(keys_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4)
    for a, b in zip(jax.tree.leaves(ns_s), jax.tree.leaves(ns_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_contrast_train_step_instance_branch(rng):
    """`pixpro_ins_loss_weight > 0` path on the REAL ContrastEncoder
    (`PixPro_swin_v5.py:243-256,287-289`): instance projector + predictor
    params exist, the loss (incl. ins term) is finite, and the key-side
    instance projector rides the EMA."""
    from stswincl_tpu.models import ContrastEncoder

    model = ContrastEncoder(num_classes=5, swin_dim=64, with_instance=True)
    clips = jnp.asarray(
        rng.standard_normal((1, 6, 4, 64, 128, 3)).astype(np.float32))
    labels = jnp.asarray(
        rng.integers(0, 5, size=(1, 6, 64, 128)).astype(np.int32))
    variables = model.init(jax.random.key(0), clips[:, 0], train=False)
    assert "projector_instance" in variables["params"]
    assert "predictor" in variables["params"]

    tx = make_lars(warmup_cosine_schedule(0.1, 10, 100))
    state = ContrastTrainState.create(variables, tx)
    # base_momentum=0 -> m~0, the key branch tracks the query branch within
    # a step: realistic momenta (0.99) move the key by ~1e-2 * grad-step,
    # which fp32 rounds away against ~0.05-magnitude kernels in a 2-step test
    step = make_contrast_train_step(model, tx, class_num=5, total_steps=100,
                                    base_momentum=0.0, ins_loss_weight=1.0)
    ins_k0 = [np.asarray(l).copy() for l in
              jax.tree.leaves(state.params_k["projector_instance"])]
    state, metrics = step(state, clips, labels)
    state, metrics = step(state, clips, labels)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["ins_loss"]))
    # cos in [-1, 1] per pair -> 2-2cos in [0, 4], summed over 2 pairs
    assert 0.0 <= float(metrics["ins_loss"]) <= 8.0
    # query-side instance projector received gradient...
    moved_q = [not np.array_equal(np.asarray(a), b) for a, b in
               zip(jax.tree.leaves(state.params_q["projector_instance"]),
                   ins_k0)]
    assert any(moved_q), "no gradient reached the instance projector"
    # ...and the key side rides the EMA (tiny but bitwise-visible change)
    moved_k = [not np.array_equal(np.asarray(a), b) for a, b in
               zip(jax.tree.leaves(state.params_k["projector_instance"]),
                   ins_k0)]
    assert any(moved_k), "key instance projector not EMA-updated"


def test_momentum_schedule_endpoints():
    m0 = contrast_momentum(0, 100, 0.99)
    mK = contrast_momentum(100, 100, 0.99)
    np.testing.assert_allclose(float(m0), 0.99, rtol=1e-6)
    np.testing.assert_allclose(float(mK), 1.0, rtol=1e-6)


def test_schedules():
    s = warmup_cosine_schedule(1.0, 10, 110, warmup_multiplier=100.0,
                               eta_min=1e-6)
    np.testing.assert_allclose(float(s(0)), 0.01, rtol=1e-5)
    np.testing.assert_allclose(float(s(10)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(s(110)), 1e-6, atol=1e-6)
    p = poly_schedule(1.0, 100)
    np.testing.assert_allclose(float(p(0)), 1.0)
    assert float(p(50)) < 1.0
    np.testing.assert_allclose(float(p(100)), 0.0, atol=1e-7)


def test_seg_train_step_sharded_matches_single(rng):
    """Data-parallel step on an 8-device CPU mesh == single-device step."""
    model = TinySeg()
    images, labels = _seg_batch(rng, b=8)
    variables = model.init(jax.random.key(0), images, train=False)
    tx = make_adam(1e-2)
    step = make_seg_train_step(model, tx, loss_type="ce")

    state_a = SegTrainState.create(variables, tx)
    state_a, m_a = step(state_a, images, labels)

    mesh = make_mesh(8)
    state_b = SegTrainState.create(variables, tx)
    state_b = replicate(state_b, mesh)
    sb = shard_batch({"image": images, "label": labels}, mesh)
    state_b, m_b = step(state_b, sb["image"], sb["label"])

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    la = jax.tree.leaves(state_a.params)[0]
    lb = jax.tree.leaves(state_b.params)[0]
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-4,
                               atol=1e-5)
    # BN stats must be the GLOBAL batch stats (SyncBN semantics)
    sa = jax.tree.leaves(state_a.batch_stats)[0]
    sbn = jax.tree.leaves(state_b.batch_stats)[0]
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sbn), rtol=1e-4,
                               atol=1e-6)


def test_contrast_train_step_sharded_matches_single(rng):
    """Stage-2 step on the 8-device mesh == single device (grads + EMA)."""
    model = TinyContrast()
    clips = jnp.asarray(
        rng.standard_normal((8, 6, 2, 16, 16, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, size=(8, 6, 16, 16)).astype(np.int32))
    variables = model.init(jax.random.key(0), clips[:, 0], train=False)
    tx = make_lars(0.1)
    step = make_contrast_train_step(model, tx, class_num=5, total_steps=100)

    s_a = ContrastTrainState.create(variables, tx)
    s_a, m_a = step(s_a, clips, labels)

    mesh = make_mesh(8)
    s_b = ContrastTrainState.create(variables, tx)
    s_b = replicate(s_b, mesh)
    sb = shard_batch({"clips": clips, "labels": labels}, mesh)
    s_b, m_b = step(s_b, sb["clips"], sb["labels"])

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    la = jax.tree.leaves(s_a.params_q)[0]
    lb = jax.tree.leaves(s_b.params_q)[0]
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-4,
                               atol=1e-5)
