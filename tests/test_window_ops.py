"""Golden tests for windowing primitives vs independently-written torch refs."""

import numpy as np
import jax.numpy as jnp
import torch

from stswincl_tpu.ops import (
    window_partition,
    window_reverse,
    cyclic_shift,
    relative_position_index,
    shifted_window_attention_mask,
)


def torch_window_partition(x, ws):
    # torch reference semantics: (B,H,W,C) -> (B*nW, ws, ws, C), H-major.
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws, ws, C)


def test_partition_matches_torch(rng):
    x = rng.standard_normal((2, 16, 24, 5)).astype(np.float32)
    ours = np.asarray(window_partition(jnp.asarray(x), 8))
    theirs = torch_window_partition(torch.from_numpy(x), 8).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_partition_reverse_roundtrip(rng):
    x = rng.standard_normal((3, 32, 40, 7)).astype(np.float32)
    w = window_partition(jnp.asarray(x), 4)
    back = window_reverse(w, 4, 32, 40)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_cyclic_shift_matches_torch_roll(rng):
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(cyclic_shift(jnp.asarray(x), 3))
    theirs = torch.roll(torch.from_numpy(x), shifts=(-3, -3), dims=(1, 2)).numpy()
    np.testing.assert_array_equal(ours, theirs)
    undone = cyclic_shift(jnp.asarray(ours), 3, reverse=True)
    np.testing.assert_array_equal(np.asarray(undone), x)


def torch_relative_position_index(wh, ww):
    coords = torch.stack(torch.meshgrid([torch.arange(wh), torch.arange(ww)], indexing="ij"))
    cf = torch.flatten(coords, 1)
    rel = cf[:, :, None] - cf[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1).numpy()


def test_relative_position_index_matches_torch():
    for wh, ww in [(8, 8), (4, 4), (3, 5)]:
        ours = relative_position_index(wh, ww)
        theirs = torch_relative_position_index(wh, ww)
        np.testing.assert_array_equal(ours, theirs)
        assert ours.max() == (2 * wh - 1) * (2 * ww - 1) - 1
        assert ours.min() == 0


def torch_sw_msa_mask(H, W, ws, ss):
    img_mask = torch.zeros((1, H, W, 1))
    h_slices = (slice(0, -ws), slice(-ws, -ss), slice(-ss, None))
    w_slices = (slice(0, -ws), slice(-ws, -ss), slice(-ss, None))
    cnt = 0
    for h in h_slices:
        for w in w_slices:
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mw = torch_window_partition(img_mask, ws).view(-1, ws * ws)
    am = mw.unsqueeze(1) - mw.unsqueeze(2)
    am = am.masked_fill(am != 0, float(-100.0)).masked_fill(am == 0, float(0.0))
    return am.numpy()


def test_sw_msa_mask_matches_torch():
    for (H, W, ws, ss) in [(64, 80, 8, 4), (32, 40, 4, 2), (16, 16, 8, 4)]:
        ours = shifted_window_attention_mask(H, W, ws, ss)
        theirs = torch_sw_msa_mask(H, W, ws, ss)
        np.testing.assert_array_equal(ours, theirs)
