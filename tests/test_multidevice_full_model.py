"""Full-model multi-device equality: the REAL TswinPlus / ContrastEncoder
train steps, sharded over the 8-device CPU mesh, must match the
single-device step bit-for-tolerance (params, BN stats, loss).

Round-1 review finding: the sharded==single tests covered tiny stand-in
models only; the full model's multi-chip correctness hung off one dryrun.
These tests make it durable. swin_dim=64 at 64x128 keeps the CPU compile
tolerable while exercising the production graph (batched resnet, pair
schedule, OHEM/contrastive loss, implicit SyncBN via global batch stats,
grad psum inserted by XLA for the mesh).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stswincl_tpu.models import TswinPlus, ContrastEncoder
from stswincl_tpu.parallel import make_mesh, shard_batch, replicate
from stswincl_tpu.train import (
    SegTrainState,
    make_seg_train_step,
    ContrastTrainState,
    make_contrast_train_step,
    make_sgd,
    make_lars,
)


@pytest.fixture(autouse=True)
def _fresh_executable_cache():
    """Drop compiled executables and released trace caches before each of
    these tests. They are the largest programs in the suite; on a full
    `pytest tests/` run the executables of the ~180 preceding tests are
    still resident, and on small hosts XLA:CPU has been seen to abort
    (SIGABRT, no message) inside the width-512 contrast step's execution
    under that accumulated footprint (2026-08-20, 1-CPU/125GB runner) —
    while the same test passes solo. Clearing is cheap relative to these
    tests' own compile times."""
    jax.clear_caches()
    import gc
    gc.collect()
    yield


def _max_tree_diff(a, b):
    diffs = jax.tree.map(
        lambda x, y: float(jnp.max(jnp.abs(x.astype(jnp.float32) -
                                           y.astype(jnp.float32)))), a, b)
    return max(jax.tree.leaves(diffs))


@pytest.mark.slow
def test_full_seg_train_step_sharded_matches_single(rng):
    model = TswinPlus(num_classes=12, swin_dim=64)
    B, T, H, W = 8, 4, 64, 128
    images = jnp.asarray(
        rng.standard_normal((B, T, H, W, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 12, size=(B, H, W)).astype(np.int32))
    variables = model.init(jax.random.key(0), images[:1], train=False)
    # SGD, not Adam: the property under test is gradient/BN-stat equality
    # across shardings. Adam's step-1 update is ~sign(grad)*lr, which
    # amplifies fp32 reduction-order noise on near-zero grads to 2*lr and
    # would mask real errors behind a loose tolerance; with SGD the param
    # delta IS the (lr-scaled) gradient, so the comparison stays tight.
    tx = make_sgd(1e-3, momentum=0.9, weight_decay=1e-4)
    step = make_seg_train_step(model, tx, loss_type="ohem")

    s_a = SegTrainState.create(variables, tx)
    s_a, m_a = step(s_a, images, labels)

    mesh = make_mesh(8)
    s_b = SegTrainState.create(variables, tx)
    s_b = replicate(s_b, mesh)
    sb = shard_batch({"image": images, "label": labels}, mesh)
    s_b, m_b = step(s_b, sb["image"], sb["label"])

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    assert _max_tree_diff(s_a.params, s_b.params) < 1e-4
    # SyncBN semantics: replicas must hold the GLOBAL batch statistics
    assert _max_tree_diff(s_a.batch_stats, s_b.batch_stats) < 1e-4


@pytest.mark.slow
def test_full_width_seg_train_step_sharded_matches_single(rng):
    """Production width (swin_dim=512): round-2 review noted all
    multi-device evidence ran swin_dim=64; this pins width-independence of
    the mesh semantics at the real channel count. depths=(1, 1) + tiny
    spatial dims keep the CPU compile tractable — width, not depth, is the
    dimension under test (the 64-wide tests cover the full depth)."""
    model = TswinPlus(num_classes=12, swin_dim=512, swin_depths=(1, 1))
    B, T, H, W = 8, 4, 64, 128
    images = jnp.asarray(
        rng.standard_normal((B, T, H, W, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 12, size=(B, H, W)).astype(np.int32))
    variables = model.init(jax.random.key(0), images[:1], train=False)
    tx = make_sgd(1e-3, momentum=0.9, weight_decay=1e-4)
    step = make_seg_train_step(model, tx, loss_type="ohem")

    s_a = SegTrainState.create(variables, tx)
    s_a, m_a = step(s_a, images, labels)
    # pull the single-layout result to host numpy (freeing its XLA:CPU
    # buffers) before dispatching the sharded execution — these are the
    # suite's biggest programs and their footprints must not overlap
    s_a, m_a = jax.device_get((s_a, m_a))

    mesh = make_mesh(8)
    s_b = SegTrainState.create(variables, tx)
    s_b = replicate(s_b, mesh)
    sb = shard_batch({"image": images, "label": labels}, mesh)
    s_b, m_b = step(s_b, sb["image"], sb["label"])

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    assert _max_tree_diff(s_a.params, s_b.params) < 1e-4
    assert _max_tree_diff(s_a.batch_stats, s_b.batch_stats) < 1e-4


@pytest.mark.slow
def test_full_width_contrast_train_step_sharded_matches_single(rng):
    """Production width (swin_dim=512) for the STAGE-2 contrastive step:
    round-3 review noted the cross-chip-negative-pool claim (the loss's
    class-sum contraction over the sharded batch axis) had width-512
    evidence only on the seg side. depths=(1, 1) + the same tiny spatial
    dims as the seg width test keep the CPU compile tractable — width is
    the dimension under test; the 64-wide test below covers full depth.
    Ref envelope: `pixcontrast_18/main_pretrain_swinv5.py:54`,
    `contrast/util.py:47-58`."""
    model = ContrastEncoder(num_classes=5, swin_dim=512, swin_depths=(1, 1))
    clips = jnp.asarray(
        rng.standard_normal((8, 6, 4, 64, 128, 3)).astype(np.float32))
    labels = jnp.asarray(
        rng.integers(0, 5, size=(8, 6, 64, 128)).astype(np.int32))
    variables = model.init(jax.random.key(0), clips[:, 0], train=False)
    tx = make_lars(0.1)
    step = make_contrast_train_step(model, tx, class_num=5, total_steps=100)

    s_a = ContrastTrainState.create(variables, tx)
    s_a, m_a = step(s_a, clips, labels)
    # force the single-layout execution to finish before dispatching the
    # sharded one: both are ~20GB-peak XLA:CPU programs and dispatch is
    # async — letting them run concurrently aborts the process (observed:
    # silent SIGABRT at the first blocking fetch, tests green when the two
    # executions are serialized). device_get additionally frees the
    # single-layout XLA buffers so the footprints never overlap (the same
    # abort resurfaced on a 1-CPU host in full-suite runs, 2026-08-20).
    s_a, m_a = jax.device_get((s_a, m_a))

    mesh = make_mesh(8)
    s_b = ContrastTrainState.create(variables, tx)
    s_b = replicate(s_b, mesh)
    sb = shard_batch({"clips": clips, "labels": labels}, mesh)
    s_b, m_b = step(s_b, sb["clips"], sb["labels"])

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    assert _max_tree_diff(s_a.params_q, s_b.params_q) < 1e-4
    assert _max_tree_diff(s_a.params_k, s_b.params_k) < 1e-4
    # the folded BN running-stats chain must agree across layouts too
    assert _max_tree_diff(s_a.stats_k, s_b.stats_k) < 1e-4


@pytest.mark.slow
def test_full_contrast_train_step_sharded_matches_single(rng):
    model = ContrastEncoder(num_classes=5, swin_dim=64)
    clips = jnp.asarray(
        rng.standard_normal((8, 6, 4, 64, 128, 3)).astype(np.float32))
    labels = jnp.asarray(
        rng.integers(0, 5, size=(8, 6, 64, 128)).astype(np.int32))
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
    assert _max_tree_diff(s_a.params_q, s_b.params_q) < 1e-4
    # the EMA'd key branch must also agree across layouts
    assert _max_tree_diff(s_a.params_k, s_b.params_k) < 1e-4
