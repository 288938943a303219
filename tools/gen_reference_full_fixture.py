"""Generate the FULL-MODEL golden fixture from the actual reference code.

Runs the reference `TswinPlus` (`seg18/net/Ours/base18.py:52-119`) — imported
directly with the timm/torchvision shims — under deterministic PCG64 weights
(`tests.reference_import.randomize_state_dict`, reproducible across torch
versions) on a PCG64 input clip at the reference's native 512x640, and pins:

  * logits strided [::8, ::8] (fp32, ~245 KiB),
  * full-tensor mean / abs-sum checksums,
  * the weight/input seeds (the state_dict itself would be ~240 MB; tests
    reconstruct it from the seed instead).

Run where /root/reference exists; the fixture is checked in so the parity
tests hold even without the reference tree.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

from tests.reference_import import (load_reference_seg18, patched_torch_load,
                                    randomize_state_dict)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "reference_full_golden.npz")
WEIGHT_SEED, INPUT_SEED = 123, 5


def main():
    base18, _ = load_reference_seg18()
    with patched_torch_load():
        model = base18.TswinPlus(12).eval()
    model.load_state_dict(randomize_state_dict(model.state_dict(),
                                               WEIGHT_SEED))
    rng = np.random.Generator(np.random.PCG64(INPUT_SEED))
    x = torch.from_numpy(
        rng.uniform(-1.0, 1.0, (1, 4, 3, 512, 640)).astype(np.float32))
    with torch.no_grad():
        logits = model(x).numpy()

    np.savez_compressed(
        OUT,
        weight_seed=np.int64(WEIGHT_SEED),
        input_seed=np.int64(INPUT_SEED),
        logits_strided=logits[:, :, ::8, ::8].astype(np.float32),
        logits_mean=np.float64(logits.mean()),
        logits_abssum=np.float64(np.abs(logits.astype(np.float64)).sum()),
    )
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1024:.0f} KiB)")


if __name__ == "__main__":
    main()
