"""Generate tests/fixtures/reference_swin_golden.npz from the ACTUAL
reference code path (`/root/reference/seg18/net/Ours/swin_512.py`).

Run once (requires the reference tree on disk); the resulting fixture is
checked in so the parity anchor holds even where /root/reference is absent.

Config: a small SwinTransformerLayerv5 (dim=16, heads=4, resolution 16x16)
— every semantic element (joint T*N window attention, tiled bias/mask,
nonstandard norm order, pair schedule with pass-through, patch merging,
stage-2 shift) is exercised at this size.
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from reference_import import load_reference_swin, reference_available

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "reference_swin_golden.npz")

DIM, HEADS, RES = 16, 4, (16, 16)


def main():
    assert reference_available(), "reference tree not on disk"
    ref = load_reference_swin()

    torch.manual_seed(0)
    model = ref.SwinTransformerLayerv5(dim=DIM, input_resolution=RES,
                                       num_heads=HEADS).eval()
    # non-trivial weights everywhere (default LayerNorm/bias inits are
    # 0/1 — randomize so drift in any parameter's use is caught)
    gen = torch.Generator().manual_seed(1)
    sd = model.state_dict()
    for k, v in sd.items():
        # derived buffers (attn_mask, relative_position_index) must keep
        # their computed values — they are semantics, not weights
        if v.dtype.is_floating_point and not k.endswith("attn_mask"):
            sd[k] = torch.empty_like(v).uniform_(-0.5, 0.5, generator=gen)
    model.load_state_dict(sd)

    x = torch.empty((2, 4, DIM, RES[0], RES[1])).uniform_(
        -1.0, 1.0, generator=gen)
    with torch.no_grad():
        s1, s2 = model(x)

    arrays = {"input": x.numpy(), "stage1": s1.numpy(), "stage2": s2.numpy()}
    for k, v in model.state_dict().items():
        if v.dtype.is_floating_point:
            arrays["sd:" + k] = v.numpy()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **arrays)
    size = os.path.getsize(OUT)
    print(f"wrote {OUT} ({size/1024:.0f} KiB, {len(arrays)} arrays)")


if __name__ == "__main__":
    main()
