"""Windowing primitives for shifted-window space-time attention.

Semantics match the reference implementation (see
`/root/reference/seg18/net/Ours/swin_512.py:26-71` for window
partition/reverse, `:89-99` for the relative-position index and `:171-194`
for the SW-MSA mask construction) but are written as pure, shape-static JAX
functions: reshapes/transposes that XLA folds into the surrounding attention
matmuls, with every host-computable constant (bias index, attention mask)
precomputed in numpy so nothing data-dependent reaches the compiled graph.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def window_partition(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nH * nW, window_size, window_size, C).

    Row-major window ordering (windows scan H then W), matching the
    reference `window_partition` (`swin_512.py:26-38`).
    """
    B, H, W, C = x.shape
    ws = window_size
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, C)


def window_reverse(windows: jnp.ndarray, window_size: int, H: int, W: int) -> jnp.ndarray:
    """Inverse of :func:`window_partition`: (B*nW, ws, ws, C) -> (B, H, W, C)."""
    ws = window_size
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


def cyclic_shift(x: jnp.ndarray, shift: int, reverse: bool = False) -> jnp.ndarray:
    """Cyclic shift over the two spatial axes of an NHWC tensor.

    Forward direction matches `torch.roll(x, (-shift, -shift), dims=(1, 2))`
    used by the reference (`swin_512.py:210-213`); `reverse=True` undoes it.
    """
    if shift == 0:
        return x
    s = shift if reverse else -shift
    return jnp.roll(x, (s, s), axis=(1, 2))


def relative_position_index(win_h: int, win_w: int) -> np.ndarray:
    """Pairwise relative-position index for a (win_h, win_w) window.

    Returns an int32 array of shape (win_h*win_w, win_h*win_w) indexing into a
    flat bias table of size (2*win_h-1)*(2*win_w-1). Construction mirrors the
    reference (`swin_512.py:89-99`). Computed host-side in numpy.
    """
    coords = np.stack(np.meshgrid(np.arange(win_h), np.arange(win_w), indexing="ij"))
    coords_flat = coords.reshape(2, -1)  # (2, N)
    rel = coords_flat[:, :, None] - coords_flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)  # (N, N, 2)
    rel[:, :, 0] += win_h - 1
    rel[:, :, 1] += win_w - 1
    rel[:, :, 0] *= 2 * win_w - 1
    return rel.sum(-1).astype(np.int32)


def shifted_window_attention_mask(
    H: int, W: int, window_size: int, shift_size: int
) -> np.ndarray:
    """SW-MSA attention mask of shape (nW, N, N) with 0 / -100 entries.

    Region-id construction matches the reference mask builder
    (`swin_512.py:171-194`): the image is split into 3x3 slabs by the
    window/shift boundaries; tokens in different slabs within the same
    (shifted) window may not attend to each other. Host-side numpy constant.
    """
    ws, ss = window_size, shift_size
    if ss == 0:
        raise ValueError("mask is only defined for shifted windows (shift_size > 0)")
    img_mask = np.zeros((1, H, W, 1), dtype=np.float32)
    h_slices = (slice(0, -ws), slice(-ws, -ss), slice(-ss, None))
    w_slices = (slice(0, -ws), slice(-ws, -ss), slice(-ss, None))
    cnt = 0
    for h in h_slices:
        for w in w_slices:
            img_mask[:, h, w, :] = cnt
            cnt += 1
    # numpy window partition of the region-id image
    m = img_mask.reshape(1, H // ws, ws, W // ws, ws, 1)
    m = m.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)  # (nW, N)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, np.float32(-100.0), np.float32(0.0))
