"""Generate tests/fixtures/transforms_golden.npz — frozen outputs of the
shipped train-path augmentation chains (EndoVis `data/endovis18.py:142-148`
and CaDIS `data/cadis.py:159-166` orders) on deterministic synthetic input.

The oracle tests in tests/test_transforms_oracle.py machine-check the
SEMANTICS against independent transcriptions of albumentations/skimage/PIL;
this fixture additionally freezes today's bytes so a PIL/cv2 environment
drift is caught. Regenerate ONLY after re-verifying semantics:

    python tools/gen_transforms_golden.py
"""

import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stswincl_tpu.data import transforms as T

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "transforms_golden.npz")

SEED = 5
BASE_W, CROP_H, CROP_W = 160, 96, 128


def main():
    gen = np.random.default_rng(42)
    frames = np.stack([gen.integers(0, 256, (120, 160, 3)).astype(np.uint8)
                       for _ in range(4)])
    mask = gen.integers(0, 12, (120, 160)).astype(np.uint8)

    # EndoVis chain
    rng = np.random.default_rng(SEED)
    imgs, m = T.random_scale_pad_crop(
        [Image.fromarray(f) for f in frames], Image.fromarray(mask),
        BASE_W, CROP_H, CROP_W, rng)
    clip = np.stack(imgs)
    clip, m = T.vertical_flip(clip, m, rng)
    clip = T.brightness_contrast(clip, rng)
    endovis_clip, endovis_mask = T.rotate(clip, m, rng)

    # CaDIS chain
    rng = np.random.default_rng(SEED + 1)
    imgs, m = T.random_scale_pad_crop(
        [Image.fromarray(f) for f in frames], Image.fromarray(mask),
        BASE_W, CROP_H, CROP_W, rng)
    clip = np.stack(imgs)
    clip, m = T.vertical_flip(clip, m, rng)
    clip, m = T.horizontal_flip(clip, m, rng)
    clip = T.gaussian_noise(clip, rng)
    cadis_clip, cadis_mask = T.rotate(clip, m, rng)

    np.savez_compressed(
        OUT, seed=SEED, base_w=BASE_W, crop_h=CROP_H, crop_w=CROP_W,
        frames=frames, mask=mask,
        endovis_clip=endovis_clip, endovis_mask=endovis_mask,
        cadis_clip=cadis_clip, cadis_mask=cadis_mask)
    print(f"wrote {OUT}")
    for k in ("endovis_clip", "cadis_clip"):
        print(k, dict(np.load(OUT))[k].shape)


if __name__ == "__main__":
    main()
