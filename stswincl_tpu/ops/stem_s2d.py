"""Space-to-depth formulation of the 7x7/s2 RGB stem convolution.

XLA's TPU conv lowering runs the torchvision stem (7x7 stride 2 on 3
channels) at ~12% MFU — the 3-channel contraction wastes nearly the whole
lane dimension of every MXU pass (measured 2.1 ms/batch of the bs=8 clip
trace vs a 0.25 ms roofline, plus a 0.5 ms input layout copy it induces).

Standard fix (MLPerf ResNet): re-index the stride-2 conv on a 2x2
space-to-depth view of the input. With z[n, p, q, (a, b, c)] =
x[n, 2p + a, 2q + b, c], the 7x7/s2/pad3 conv over 3 channels is EXACTLY a
4x4/s1 conv over 12 channels with asymmetric padding (2, 1):

  out[i, j] = sum_{dy, dx, c} x[2i + dy - 3, 2j + dx - 3, c] * w[dy, dx, c]
            = sum_{dp, dq, a, b, c} z[i + dp, j + dq, (a, b, c)]
                                    * w[2 dp + a + 3, 2 dq + b + 3, c]

with dp, dq in [-2, 1] and the single out-of-range tap (dy = -1 at
dp = -2, a = 0) given a zero weight. The contraction K grows 147 -> 192
arranged in MXU-friendly 12-channel groups. The scatter of the original
(7, 7, 3, C) kernel into the (4, 4, 12, C) layout is a tiny reshape done
per forward, so the PARAMETER stays torch-shaped (checkpoint/torch-import
compatible). Ref stem: torchvision resnet18 via
`seg18/net/Ours/resnet.py:93-107`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def s2d_stem_kernel(w):
    """(7, 7, Cin, Cout) stride-2 kernel -> its (4, 4, 4*Cin, Cout)
    space-to-depth equivalent (zero-padded out-of-range taps)."""
    kh, kw, cin, cout = w.shape
    assert kh == 7 and kw == 7
    # index (2dp' + a, 2dq' + b) of the FRONT-padded 8x8 kernel, where
    # dy = 2(dp' - 2) + a + 3 = 2dp' + a - 1  ->  padded index dy + 1
    w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w8 = w8.reshape(4, 2, 4, 2, cin, cout)          # (dp', a, dq', b, c, o)
    w8 = w8.transpose(0, 2, 1, 3, 4, 5)             # (dp', dq', a, b, c, o)
    return w8.reshape(4, 4, 4 * cin, cout)


def space_to_depth(x):
    """(N, H, W, C) -> (N, H/2, W/2, 4C), channel order (a, b, c)."""
    N, H, W, C = x.shape
    z = x.reshape(N, H // 2, 2, W // 2, 2, C)
    z = z.transpose(0, 1, 3, 2, 4, 5)
    return z.reshape(N, H // 2, W // 2, 4 * C)


def stem_s2d_conv(x, w, dtype):
    """The full stem conv via space-to-depth. x: (N, H, W, Cin) with even
    H, W; w: the torch-shaped (7, 7, Cin, Cout) stride-2 kernel.
    Bit-compatible with the direct conv up to fp32 accumulation order
    (the extra taps are exact zeros)."""
    z = space_to_depth(x.astype(dtype))
    wz = s2d_stem_kernel(w).astype(dtype)
    return jax.lax.conv_general_dilated(
        z, wz, window_strides=(1, 1), padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(dtype)


def stem_s2d_conv_split(x, w, dtype):
    """Split-parity space-to-depth stem: same math as `stem_s2d_conv`
    WITHOUT the XLA transpose that sank the packed route (~12 ms layout
    shuffle on the (32, 512, 640, 3) clip input, see
    `stem_s2d_applicable`). Key observation: folding the COLUMN parity
    into channels is a pure minor-dim view in row-major NHWC —
    (N, H', W, C) -> (N, H', W/2, 2C) moves no data — so only the ROW
    parity needs real movement, and a stride-2 row slice is a plain
    memory copy (no 3-element minor shuffle). The s2d conv then splits
    over the row parity a:

      out = conv4x4_s1(z_even, wz[a=0]) + conv4x4_s1(z_odd, wz[a=1])

    where `s2d_stem_kernel`'s channel order is a-major (a*2C + b*C + c),
    so the two kernel halves are contiguous slices. Each conv contracts
    K = 16 taps * 2*Cin channels (96 for RGB) instead of the direct
    stem's 3.

    ALSO measured NEGATIVE on v5e (2026-08-20, tools/profile_stem_split.py):
    9.5 ms vs 5.7 standalone at the (32, 512, 640, 3) clip shape. The trace
    shows the two C_in=6 convs themselves cost ~2.4 + ~3.2 ms — XLA's TPU
    conv lowering contracts per-tap input channels regardless of the 4x4
    kernel regrouping, so widening Cin 3 -> 6/12 does not fill the MXU's
    contraction lanes the way the arithmetic suggests. Together with the
    packed route's transpose loss this pins the stem residual (~2.1 ms at
    ~12% MFU, r5 trace) on the conv LOWERING itself, not on any s2d
    data-movement strategy: kept as the measured record behind the
    irreducibility claim in README's residual table."""
    N, H, W, C = x.shape
    xb = x.astype(dtype)
    z_even = xb[:, 0::2].reshape(N, H // 2, W // 2, 2 * C)
    z_odd = xb[:, 1::2].reshape(N, H // 2, W // 2, 2 * C)
    wz = s2d_stem_kernel(w).astype(dtype)
    kwargs = dict(window_strides=(1, 1), padding=((2, 1), (2, 1)),
                  dimension_numbers=("NHWC", "HWIO", "NHWC"),
                  preferred_element_type=jnp.float32)
    out = (jax.lax.conv_general_dilated(z_even, wz[:, :, :2 * C], **kwargs)
           + jax.lax.conv_general_dilated(z_odd, wz[:, :, 2 * C:], **kwargs))
    return out.astype(dtype)


def stem_s2d_applicable(x, kernel: int, stride: int) -> bool:
    """Measured NEGATIVE on v5e (2026-08-19): the bs=8 clip path dropped
    86.1 -> 74.5 fps/chip with this route on — XLA lowers the
    space-to-depth transpose of the (32, 512, 640, 3) input as a ~12 ms
    layout shuffle (3-channel minor elements defeat vectorized relayout),
    dwarfing the ~1.8 ms the 12-channel conv could have saved. Kept
    opt-in (STSWIN_S2D_STEM=1) as the measured record; the math is exact
    (tests/test_stem_s2d.py)."""
    import os
    from stswincl_tpu.ops.pallas_attention import _is_tpu_backend
    if os.environ.get("STSWIN_S2D_STEM", "0") != "1":
        return False
    return (kernel == 7 and stride == 2 and _is_tpu_backend()
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
