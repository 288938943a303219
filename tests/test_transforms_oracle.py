"""Oracle tests for the SHIPPED train-path augmentations (round-4 ask).

`stswincl_tpu/data/transforms.py` replicates the reference's albumentations/
skimage/PIL training pipeline (`seg18/dataset/Endovis2018_new.py:68-84,
145-182`, `segcata/dataset/CATA_new_512.py:169-226`) by re-derivation.
albumentations is NOT installable in this environment, so the oracle here is
a second, independent transcription of the library semantics, written from
the albumentations/skimage source (LUT-based uint8 brightness/contrast,
stacked-image warp, ImageOps.expand padding, `random_noise` formula), plus
analytic invariants that pin behavior no re-derivation can fake:

  * the reference rotates/flips the (H, W, C*T) frame-STACKED image once
    (`Endovis2018_new.py:69-79`); the shipped code transforms frames
    individually — tests assert both give IDENTICAL bytes;
  * brightness/contrast via albumentations' LUT path == shipped arithmetic;
  * rotation by exactly 90 deg on a square grid == np.rot90 (pins center
    convention + interpolation exactness); 0 deg == identity;
  * label maps pass through rotation without value interpolation;
  * `random_scale_pad_crop` == a literal PIL transcription of the
    reference's `_random_scale` with mirrored random draws;
  * gaussian noise == the skimage `random_noise(mode='gaussian', clip=True)`
    formula with mirrored draws.

Rotate-center note: the shipped kernel rotates about (w/2-0.5, h/2-0.5) —
the true pixel-grid center. albumentations changed its own convention across
versions (older releases rotated about (w/2, h/2), a half-pixel offset later
fixed upstream); the reference pins no version, so the geometrically-correct
center is the semantics we pin here (test_rotate_90_square_is_rot90 fails if
it drifts).

A composed golden fixture (tests/fixtures/transforms_golden.npz, generated
by tools/gen_transforms_golden.py) additionally freezes today's outputs so
environment drift (PIL/cv2 version changes) is caught too.
"""

import math
import os

import numpy as np
import pytest
from PIL import Image, ImageOps

import cv2

from stswincl_tpu.data import transforms as T

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "transforms_golden.npz")


def _rand_clip(rng, t=4, h=64, w=80, c=3):
    return rng.integers(0, 256, size=(t, h, w, c)).astype(np.uint8)


def _stack(images):
    """The reference's t-stacking: (T,H,W,C) -> (H,W,C*T)
    (`Endovis2018_new.py:69-71`)."""
    t, h, w, c = images.shape
    return np.ascontiguousarray(
        images.transpose(1, 2, 0, 3).reshape(h, w, c * t))


def _unstack(img, t, c=3):
    h, w, ct = img.shape
    return np.ascontiguousarray(
        img.reshape(h, w, t, c).transpose(2, 0, 1, 3))


# ---------------- brightness / contrast ----------------

def _alb_brightness_contrast_uint8(img, alpha, beta):
    """Independent transcription of albumentations'
    _brightness_contrast_adjust_uint (brightness_by_max=True): a 256-entry
    LUT, float32 math, clip, truncating uint8 cast, cv2.LUT apply."""
    lut = np.arange(0, 256, dtype=np.float32)
    lut = lut * np.float32(alpha) + np.float32(beta) * 255.0
    lut = np.clip(lut, 0, 255).astype(np.uint8)
    return cv2.LUT(img.reshape(-1, img.shape[-1]), lut).reshape(img.shape)


def test_brightness_contrast_matches_albumentations_lut(rng):
    clip = _rand_clip(rng)
    seed = _accepting_seed(
        lambda s: np.random.default_rng(s).random() < 0.5)
    out = T.brightness_contrast(clip, np.random.default_rng(seed))
    # mirror the shipped draw order: accept-gate, alpha, beta
    r = np.random.default_rng(seed)
    gate = r.random()
    assert gate < 0.5
    alpha = 1.0 + r.uniform(-0.2, 0.2)
    beta = r.uniform(-0.2, 0.2)
    # the reference applies ONE LUT to the stacked image; equality of the
    # per-frame path with the stacked path is part of the claim
    ref = _unstack(_alb_brightness_contrast_uint8(_stack(clip), alpha, beta),
                   t=clip.shape[0])
    np.testing.assert_array_equal(out, ref)


def test_brightness_contrast_skip_gate(rng):
    clip = _rand_clip(rng)
    for seed in range(30):
        r = np.random.default_rng(seed)
        if r.random() >= 0.5:  # gate rejects
            out = T.brightness_contrast(clip, np.random.default_rng(seed))
            np.testing.assert_array_equal(out, clip)
            return
    pytest.fail("no rejecting seed found")


# ---------------- flips ----------------

def test_vertical_flip_matches_stacked_flipud(rng):
    clip, mask = _rand_clip(rng), rng.integers(0, 12, (64, 80)).astype(np.uint8)
    for seed in range(30):
        if np.random.default_rng(seed).random() < 0.5:
            out_c, out_m = T.vertical_flip(clip, mask,
                                           np.random.default_rng(seed))
            ref = _unstack(np.flipud(_stack(clip)).copy(), t=clip.shape[0])
            np.testing.assert_array_equal(out_c, ref)
            np.testing.assert_array_equal(out_m, np.flipud(mask))
            return
    pytest.fail("no accepting seed found")


def test_horizontal_flip_matches_stacked_fliplr(rng):
    clip, mask = _rand_clip(rng), rng.integers(0, 12, (64, 80)).astype(np.uint8)
    for seed in range(30):
        if np.random.default_rng(seed).random() < 0.5:
            out_c, out_m = T.horizontal_flip(clip, mask,
                                             np.random.default_rng(seed))
            ref = _unstack(np.fliplr(_stack(clip)).copy(), t=clip.shape[0])
            np.testing.assert_array_equal(out_c, ref)
            np.testing.assert_array_equal(out_m, np.fliplr(mask))
            return
    pytest.fail("no accepting seed found")


# ---------------- rotation ----------------

def _mirror_rotate_params(seed, limit=90):
    r = np.random.default_rng(seed)
    gate = r.random()
    if gate >= 0.5:
        return None
    return float(r.uniform(-limit, limit))


def _accepting_seed(pred, n=60):
    for seed in range(n):
        if pred(seed):
            return seed
    pytest.fail("no accepting seed found")


def test_rotate_per_frame_equals_stacked_warp(rng):
    """The reference warps the (H,W,C*T) stack once; shipped warps each
    frame. cv2.warpAffine is channel-independent, so bytes must match."""
    clip = _rand_clip(rng, c=3)
    mask = rng.integers(0, 12, (64, 80)).astype(np.uint8)
    seed = _accepting_seed(lambda s: _mirror_rotate_params(s) is not None)
    angle = _mirror_rotate_params(seed)
    out_c, out_m = T.rotate(clip, mask, np.random.default_rng(seed))

    h, w = mask.shape
    m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, 1.0)
    stacked = _stack(clip)
    # cv2 warps at most 4 channels at once; the library splits internally —
    # emulate the stacked warp in 3-channel groups (same arithmetic)
    groups = [cv2.warpAffine(stacked[..., i:i + 3], m, (w, h),
                             flags=cv2.INTER_LINEAR,
                             borderMode=cv2.BORDER_REFLECT_101)
              for i in range(0, stacked.shape[-1], 3)]
    ref = _unstack(np.concatenate(groups, axis=-1), t=clip.shape[0])
    np.testing.assert_array_equal(out_c, ref)
    ref_m = cv2.warpAffine(mask, m, (w, h), flags=cv2.INTER_NEAREST,
                           borderMode=cv2.BORDER_REFLECT_101)
    np.testing.assert_array_equal(out_m, ref_m)


def test_rotate_90_square_is_rot90(rng):
    """On a square grid, +/-90 deg about the true pixel center is an exact
    grid permutation: must equal np.rot90 bit-for-bit (pins both the center
    convention and interpolation exactness at on-grid samples)."""
    clip = _rand_clip(rng, h=64, w=64)
    mask = rng.integers(0, 12, (64, 64)).astype(np.uint8)

    class FixedRng:
        def __init__(self, angle):
            self._angle = angle

        def random(self):
            return 0.0  # always accept

        def uniform(self, lo, hi):
            return self._angle

    for angle, k in ((90.0, 1), (-90.0, 3)):
        out_c, out_m = T.rotate(clip, mask, FixedRng(angle))
        # cv2's positive angle is counter-clockwise == np.rot90(k=1)
        np.testing.assert_array_equal(out_c, np.rot90(clip, k=k, axes=(1, 2)))
        np.testing.assert_array_equal(out_m, np.rot90(mask, k=k))


def test_rotate_zero_is_identity(rng):
    clip = _rand_clip(rng)
    mask = rng.integers(0, 12, (64, 80)).astype(np.uint8)

    class ZeroRng:
        def random(self):
            return 0.0

        def uniform(self, lo, hi):
            return 0.0

    out_c, out_m = T.rotate(clip, mask, ZeroRng())
    np.testing.assert_array_equal(out_c, clip)
    np.testing.assert_array_equal(out_m, mask)


def test_rotate_mask_values_never_interpolated(rng):
    """Nearest-neighbor label warp: output values must be a subset of input
    values (albumentations warps masks with INTER_NEAREST)."""
    mask = (rng.integers(0, 3, (64, 80)) * 5).astype(np.uint8)  # {0,5,10}
    clip = _rand_clip(rng)
    seed = _accepting_seed(lambda s: _mirror_rotate_params(s) is not None)
    _, out_m = T.rotate(clip, mask, np.random.default_rng(seed))
    assert set(np.unique(out_m)) <= set(np.unique(mask))


# ---------------- gaussian noise (CaDIS menu) ----------------

def test_gaussian_noise_matches_skimage_formula(rng):
    """skimage.util.random_noise(mode='gaussian', var=1e-3, clip=True):
    out = clip(img/255 + N(0, sqrt(var)), 0, 1); reference then *255 and
    truncating-casts to uint8 (`CATA_new_512.py:179-183`)."""
    clip = _rand_clip(rng)
    seed = _accepting_seed(
        lambda s: np.random.default_rng(s).random() < 0.5)
    out = T.gaussian_noise(clip, np.random.default_rng(seed))

    r = np.random.default_rng(seed)
    assert r.random() < 0.5
    x = clip.astype(np.float32) / 255.0
    noise = r.normal(0.0, math.sqrt(0.001), size=x.shape)
    ref = (np.clip(x + noise, 0.0, 1.0) * 255.0).astype(np.uint8)
    np.testing.assert_array_equal(out, ref)


# ---------------- shared scale / pad / crop ----------------

def _reference_random_scale(imgs, mask, base_w, crop_h, crop_w,
                            long_size, x1, y1):
    """Literal PIL transcription of `_random_scale`
    (`Endovis2018_new.py:145-182`) with the random draws injected."""
    w, h = imgs[0].size
    if h > w:
        oh = long_size
        ow = int(1.0 * w * long_size / h + 0.5)
        short_size = ow
    else:
        ow = long_size
        oh = int(1.0 * h * long_size / w + 0.5)
        short_size = oh
    imgs = [im.resize((ow, oh), Image.BILINEAR) for im in imgs]
    mask = mask.resize((ow, oh), Image.NEAREST)
    if short_size < crop_w:
        padh = crop_h - oh if oh < crop_h else 0
        padw = crop_w - ow if ow < crop_w else 0
        imgs = [ImageOps.expand(im, border=(0, 0, padw, padh), fill=0)
                for im in imgs]
        mask = ImageOps.expand(mask, border=(0, 0, padw, padh), fill=0)
    imgs = [np.array(im.crop((x1, y1, x1 + crop_w, y1 + crop_h)))
            for im in imgs]
    mask = np.array(mask.crop((x1, y1, x1 + crop_w, y1 + crop_h)))
    return imgs, mask


@pytest.mark.parametrize("seed", [3, 11, 19])
def test_random_scale_pad_crop_matches_reference_transcription(rng, seed):
    base_w, crop_h, crop_w = 160, 96, 128
    frames = [Image.fromarray(
        rng.integers(0, 256, (120, 160, 3)).astype(np.uint8)) for _ in range(4)]
    mask = Image.fromarray(rng.integers(0, 12, (120, 160)).astype(np.uint8))

    out_imgs, out_mask = T.random_scale_pad_crop(
        frames, mask, base_w, crop_h, crop_w, np.random.default_rng(seed))

    # mirror the shipped draw order (long_size, then x1, y1 post-pad)
    r = np.random.default_rng(seed)
    long_size = int(r.integers(int(base_w * 0.5), int(base_w * 2.0) + 1))
    w0, h0 = frames[0].size
    if h0 > w0:
        oh, ow = long_size, int(1.0 * w0 * long_size / h0 + 0.5)
        short = ow
    else:
        ow, oh = long_size, int(1.0 * h0 * long_size / w0 + 0.5)
        short = oh
    pw = crop_w - ow if (short < crop_w and ow < crop_w) else 0
    ph = crop_h - oh if (short < crop_w and oh < crop_h) else 0
    x1 = int(r.integers(0, ow + pw - crop_w + 1))
    y1 = int(r.integers(0, oh + ph - crop_h + 1))

    ref_imgs, ref_mask = _reference_random_scale(
        frames, mask, base_w, crop_h, crop_w, long_size, x1, y1)
    for a, b in zip(out_imgs, ref_imgs):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(out_mask, ref_mask)


def test_pad_br_matches_imageops_expand(rng):
    im = Image.fromarray(rng.integers(0, 256, (40, 50, 3)).astype(np.uint8))
    ours = T._pad_br(im, 7, 9, 0)
    ref = ImageOps.expand(im, border=(0, 0, 7, 9), fill=0)
    np.testing.assert_array_equal(np.array(ours), np.array(ref))


# ---------------- composed golden (environment drift guard) ----------------

def test_composed_pipeline_matches_golden():
    """The full EndoVis train-path aug chain (scale/pad/crop -> V-flip ->
    brightness/contrast -> rotate, `data/endovis18.py:142-148`) and the
    CaDIS chain, frozen at generation time. Fails if transforms.py OR the
    PIL/cv2 environment drifts. Regenerate ONLY after verifying semantics:
    python tools/gen_transforms_golden.py"""
    assert os.path.exists(FIXTURE), (
        "missing golden fixture; run tools/gen_transforms_golden.py")
    g = np.load(FIXTURE)

    rng = np.random.default_rng(int(g["seed"]))
    frames = [Image.fromarray(f) for f in g["frames"]]
    mask = Image.fromarray(g["mask"])
    imgs, m = T.random_scale_pad_crop(frames, mask, int(g["base_w"]),
                                      int(g["crop_h"]), int(g["crop_w"]), rng)
    clip = np.stack(imgs)
    clip, m = T.vertical_flip(clip, m, rng)
    clip = T.brightness_contrast(clip, rng)
    clip, m = T.rotate(clip, m, rng)
    np.testing.assert_array_equal(clip, g["endovis_clip"])
    np.testing.assert_array_equal(m, g["endovis_mask"])

    rng = np.random.default_rng(int(g["seed"]) + 1)
    imgs, m = T.random_scale_pad_crop(frames, mask, int(g["base_w"]),
                                      int(g["crop_h"]), int(g["crop_w"]), rng)
    clip = np.stack(imgs)
    clip, m = T.vertical_flip(clip, m, rng)
    clip, m = T.horizontal_flip(clip, m, rng)
    clip = T.gaussian_noise(clip, rng)
    clip, m = T.rotate(clip, m, rng)
    np.testing.assert_array_equal(clip, g["cadis_clip"])
    np.testing.assert_array_equal(m, g["cadis_mask"])
