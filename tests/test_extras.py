"""Tests for auxiliary components: ResNet50 baseline, BCE loss, viz,
collectives, profiling."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from stswincl_tpu.models import DeepLabV3Plus
from stswincl_tpu.models.resnet import ResNet50OS16
from stswincl_tpu.train.train_seg import bce_loss, dice_loss
from stswincl_tpu.eval.visualization import (
    label_to_rgb, cadis_mask_to_rgb, CADIS_COLORMAP)


def test_resnet50_os16_shape(rng):
    m = ResNet50OS16()
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    v = m.init(jax.random.key(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 4, 4, 2048)  # OS16, 4*512 channels


def test_deeplab50(rng):
    m = DeepLabV3Plus(num_classes=7, layers=50)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    v = m.init(jax.random.key(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 64, 64, 7)


def test_bce_loss_matches_torch(rng):
    B, H, W, C = 2, 8, 8, 5
    logits = rng.standard_normal((B, H, W, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(B, H, W)).astype(np.int64)
    got = float(bce_loss(jnp.asarray(logits), jnp.asarray(labels), C))
    # torch reference semantics: per-class binary CE over softmax, averaged
    probs = F.softmax(torch.from_numpy(logits).reshape(-1, C), dim=1)
    onehot = F.one_hot(torch.from_numpy(labels).reshape(-1), C).float()
    total = 0.0
    for c in range(C):
        total += F.binary_cross_entropy(probs[:, c], onehot[:, c]).item()
    np.testing.assert_allclose(got, total / C, rtol=1e-4)


def test_dice_loss_matches_torch(rng):
    B, H, W, C = 2, 8, 8, 5
    logits = rng.standard_normal((B, H, W, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(B, H, W)).astype(np.int64)
    got = float(dice_loss(jnp.asarray(logits), jnp.asarray(labels), C))
    probs = F.softmax(torch.from_numpy(logits).permute(0, 3, 1, 2), dim=1)
    onehot = F.one_hot(torch.from_numpy(labels), C).permute(0, 3, 1, 2).float()
    inter = (probs * onehot).sum()
    union = probs.sum() + onehot.sum() + 1e-6
    want = float(1 - 2 * inter / union)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_label_to_rgb():
    mask = np.array([[0, 1], [2, 99]])
    cmap = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    rgb = label_to_rgb(mask, cmap)
    assert rgb[0, 0].tolist() == [255, 0, 0]
    assert rgb[1, 1].tolist() == [0, 0, 0]  # out-of-table -> black


def test_cadis_viz_tags():
    mask = np.arange(36).reshape(6, 6) % 8
    for tag in ("1", "2", "3"):
        rgb = cadis_mask_to_rgb(mask, tag)
        assert rgb.shape == (6, 6, 3)
    # class 0 keeps its paper color across experiments
    assert cadis_mask_to_rgb(np.zeros((1, 1), int), "2")[0, 0].tolist() == \
        CADIS_COLORMAP[0].tolist()


def test_collectives_shard_map(rng):
    """dist_collect / reduce_mean under shard_map over the 8-dev CPU mesh."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from stswincl_tpu.parallel import make_mesh
    from stswincl_tpu.parallel.collectives import dist_collect, reduce_mean

    mesh = make_mesh(8)
    x = jnp.arange(16.0).reshape(16, 1)

    def f(xs):
        return dist_collect(xs, "data"), reduce_mean(jnp.mean(xs), "data")

    gathered, mean = jax.jit(shard_map(
        f, mesh=mesh, in_specs=P("data"),
        out_specs=(P("data"), P())))(x)
    # every shard gathered the full array -> output is the identity layout
    np.testing.assert_allclose(np.asarray(mean), x.mean(), rtol=1e-6)


def test_step_timer():
    from stswincl_tpu.utils.profiling import StepTimer
    t = StepTimer(skip_first=1)
    for _ in range(4):
        with t:
            pass
    s = t.summary()
    assert s["steps"] == 3 and s["mean_s"] >= 0


def test_sgd_head_lr_mult(rng):
    """`make_sgd(head_lr_mult=10)` scales ONLY the classifier subtree's
    updates x10 (the reference's intended head group,
    `train_CL_ft_mswin_sgd_minput.py:147-159`); default 1.0 is uniform."""
    import jax
    import jax.numpy as jnp
    from stswincl_tpu.train.optim import make_sgd

    params = {
        "resnet": {"kernel": jnp.ones((3, 3))},
        "classifier": {"conv2": {"kernel": jnp.ones((2, 2)),
                                 "bias": jnp.zeros((2,))}},
    }
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.5), params)

    tx_uniform = make_sgd(1e-2, momentum=0.0, weight_decay=0.0)
    tx_head = make_sgd(1e-2, momentum=0.0, weight_decay=0.0,
                       head_lr_mult=10.0)
    up_u, _ = tx_uniform.update(grads, tx_uniform.init(params), params)
    up_h, _ = tx_head.update(grads, tx_head.init(params), params)

    np.testing.assert_allclose(np.asarray(up_h["resnet"]["kernel"]),
                               np.asarray(up_u["resnet"]["kernel"]))
    np.testing.assert_allclose(
        np.asarray(up_h["classifier"]["conv2"]["kernel"]),
        10.0 * np.asarray(up_u["classifier"]["conv2"]["kernel"]))
    np.testing.assert_allclose(
        np.asarray(up_h["classifier"]["conv2"]["bias"]),
        10.0 * np.asarray(up_u["classifier"]["conv2"]["bias"]))
