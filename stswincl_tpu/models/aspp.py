"""Atrous Spatial Pyramid Pooling head, NHWC.

Parity with the reference `ASPP` (`/root/reference/seg18/net/Ours/ASPP.py:
7-52`): 1x1 + three dilated 3x3 branches (rates 6/12/18) + global-average
image pooling, each to C/2 channels, concat -> 1x1 -> out conv. The
constructor's `num_classes` is really the output channel count (256 when
used inside TswinPlus, `base18.py:59`). `in_channels` is parameterized so
the same module covers the 1024-ch Swin-stage-2 use and the 512-ch
DeepLabV3+ baseline (reference duplicates files `ASPP.py`/`ASPP_deeplab2.py`
for this).

The image-pool branch upsamples a 1x1 map bilinearly — mathematically a
broadcast, implemented as one.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from stswincl_tpu.models.norm import BN_MOMENTUM, BN_EPSILON

from stswincl_tpu.models.init import torch_conv_kernel_init, torch_bias_init

Dtype = Any


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.dilation * (self.kernel - 1) // 2
        fan_in = self.kernel * self.kernel * x.shape[-1]
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=True,  # reference ASPP convs keep their bias
            kernel_init=torch_conv_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPSILON,
            dtype=jnp.float32, name="bn",
        )(x)
        return nn.relu(x.astype(self.dtype))


class ASPP(nn.Module):
    """`mid_channels` defaults to in/2 (the 1024-ch reference ASPP,
    `ASPP.py:10-31`); the Bottleneck variant (`ASPP.py:54-78`) uses 2048 in
    with fixed 256-ch branches — pass mid_channels=256 for that wiring."""

    in_channels: int = 1024
    out_channels: int = 256
    mid_channels: int = 0  # 0 -> in_channels // 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        assert C == self.in_channels
        mid = self.mid_channels or self.in_channels // 2

        b0 = ConvBNRelu(mid, 1, dtype=self.dtype, name="branch_1x1")(x, train)
        b1 = ConvBNRelu(mid, 3, 6, dtype=self.dtype, name="branch_r6")(x, train)
        b2 = ConvBNRelu(mid, 3, 12, dtype=self.dtype, name="branch_r12")(x, train)
        b3 = ConvBNRelu(mid, 3, 18, dtype=self.dtype, name="branch_r18")(x, train)

        img = jnp.mean(x, axis=(1, 2), keepdims=True)  # (B,1,1,C)
        img = ConvBNRelu(mid, 1, dtype=self.dtype, name="branch_img")(img, train)
        img = jnp.broadcast_to(img, (B, H, W, mid))  # bilinear from 1x1 == broadcast

        out = jnp.concatenate([b0, b1, b2, b3, img], axis=-1)
        out = ConvBNRelu(mid, 1, dtype=self.dtype, name="fuse")(out, train)
        out = nn.Conv(
            self.out_channels, (1, 1), use_bias=True,
            kernel_init=torch_conv_kernel_init,
            bias_init=torch_bias_init(out.shape[-1]),
            dtype=self.dtype, name="out_conv",
        )(out)
        return out
