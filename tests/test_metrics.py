"""Metric parity vs independently computed references."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from stswincl_tpu.eval import (
    EndovisEvaluator,
    per_class_dice,
    segmentation_metrics,
)
from stswincl_tpu.ops.resize import resize_bilinear_align_corners


def test_dice_simple():
    gt = np.zeros((8, 8), dtype=np.int64)
    gt[:4] = 3
    pred = np.zeros((8, 8), dtype=np.int64)
    pred[:2] = 3
    res = per_class_dice(gt, pred)
    assert len(res) == 1 and res[0][0] == 3
    # dice(3) = 2*16/(32+16)
    np.testing.assert_allclose(res[0][1], 2 * 16 / 48, rtol=1e-9)


def test_endovis_evaluator_aggregation(rng):
    ev = EndovisEvaluator(num_classes=5, num_sequences=2)
    frames = []
    for i in range(6):
        gt = rng.integers(0, 5, size=(16, 16))
        pred = rng.integers(0, 5, size=(16, 16))
        seq = 1 if i < 3 else 2
        ev.update(gt, pred, seq)
        frames.append((gt, pred, seq))
    s = ev.summary()
    # recompute by hand
    fd = []
    for gt, pred, seq in frames:
        ds = [d for _, d in per_class_dice(gt, pred)]
        fd.append(np.mean(ds))
    np.testing.assert_allclose(s["dice"], np.mean(fd), rtol=1e-9)
    np.testing.assert_allclose(s["dice_per_seq"][0], np.mean(fd[:3]), rtol=1e-9)
    assert s["frames"] == 6


def test_cadis_metrics_with_ignore(rng):
    n = 8
    gts, preds = [], []
    for _ in range(4):
        gt = rng.integers(0, n, size=(32, 32))
        gt[:4, :4] = 255  # ignore region
        pred = rng.integers(0, n, size=(32, 32))
        gts.append(gt)
        preds.append(pred)
    pa, pac, pac_c, miou, miou_c = segmentation_metrics(gts, preds, n)
    # manual PA on valid pixels
    valid_correct = sum(((g == p) & (g < n)).sum() for g, p in zip(gts, preds))
    valid_total = sum((g < n).sum() for g in gts)
    np.testing.assert_allclose(pa, valid_correct / valid_total, rtol=1e-9)
    assert 0 <= miou <= 1
    assert len(miou_c) == n


def test_align_corners_resize_matches_torch(rng):
    x = rng.standard_normal((1, 16, 20, 3)).astype(np.float32)
    ours = resize_bilinear_align_corners(jnp.asarray(x), 64, 80)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.interpolate(xt, (64, 80), mode="bilinear", align_corners=True)
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), want, rtol=1e-5, atol=1e-5)


def test_resize_cf_matmul_matches_gather_resize(rng):
    """Matrix-form channels-first resize == jax.image.resize == torch
    F.interpolate(align_corners=False)."""
    import jax
    from stswincl_tpu.ops.resize import resize_bilinear_cf_matmul

    x = rng.standard_normal((2, 5, 16, 20)).astype(np.float32)
    got = resize_bilinear_cf_matmul(jnp.asarray(x), 128, 160)
    want_jax = jax.image.resize(jnp.asarray(x), (2, 5, 128, 160),
                                method="bilinear", antialias=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_jax),
                               rtol=1e-5, atol=1e-5)
    want_t = F.interpolate(torch.from_numpy(x), (128, 160), mode="bilinear",
                           align_corners=False).numpy()
    np.testing.assert_allclose(np.asarray(got), want_t, rtol=1e-5, atol=1e-5)


def test_upsample_argmax_matches_reference_path(rng):
    """Fused channels-first upsample+argmax == NHWC resize then argmax,
    both align modes (it exists purely to dodge the lane-padding blowup)."""
    from stswincl_tpu.ops.resize import upsample_argmax, resize_bilinear

    x = jnp.asarray(rng.standard_normal((2, 16, 20, 12)).astype(np.float32))
    got = upsample_argmax(x, 64, 80, align_corners=True)
    want = jnp.argmax(resize_bilinear_align_corners(x, 64, 80), axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert got.dtype == jnp.int32

    got_f = upsample_argmax(x, 64, 80, align_corners=False)
    want_f = jnp.argmax(resize_bilinear(x, 64, 80), axis=-1)
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(want_f))

    # no-resize case
    same = upsample_argmax(x, 16, 20)
    np.testing.assert_array_equal(np.asarray(same),
                                  np.asarray(jnp.argmax(x, -1)))


def test_nearest_resize_matches_torch(rng):
    from stswincl_tpu.ops import resize_nearest
    x = rng.integers(0, 12, size=(1, 64, 80, 1)).astype(np.float32)
    ours = resize_nearest(jnp.asarray(x), 8, 10)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.interpolate(xt, (8, 10), mode="nearest").numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(np.asarray(ours), want)


def test_bilinear_upsample_matches_torch(rng):
    from stswincl_tpu.ops import resize_bilinear
    x = rng.standard_normal((2, 8, 10, 4)).astype(np.float32)
    ours = resize_bilinear(jnp.asarray(x), 32, 40)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.interpolate(xt, (32, 40), mode="bilinear", align_corners=False)
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), want, rtol=1e-4, atol=1e-5)
