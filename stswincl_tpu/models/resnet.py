"""ResNet18-OS8 dilated backbone, NHWC / TPU-native.

Capability parity with the reference backbone
(`/root/reference/seg18/net/Ours/resnet.py:93-137`): torchvision resnet18
stem + layer1/layer2, followed by two custom dilated stages (dilation 2 and
4, stride 1) giving output-stride 8 with 512 channels.

TPU-first choices:
  * NHWC layout end-to-end (TPU convolutions are natively NHWC; NCHW would
    insert transposes around every conv),
  * explicit padding tuples replicating torch's symmetric conv padding so
    imported torchvision weights produce identical activations,
  * the caller folds the clip's T axis into the batch (one big conv per
    layer instead of the reference's per-frame python loop,
    `base18.py:86-89`) — T*B images saturate the MXU in one pass,
  * BatchNorm runs in fp32 with explicit running stats (`batch_stats`
    collection); under pjit with a batch-sharded mesh the batch statistics
    are computed globally by construction (jnp.mean over a sharded axis is
    a global mean), which supersedes the reference's SyncBatchNorm
    conversion (`PixPro_swin_v5.py:215-228`).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from stswincl_tpu.models.norm import BN_MOMENTUM, BN_EPSILON

from stswincl_tpu.models.init import torch_conv_kernel_init

Dtype = Any


def max_pool_3x3_s2(x):
    """torchvision stem maxpool (3x3/s2/p1) as two 1-D pools.

    Bit-identical to the 2-D `nn.max_pool` (max is associative; both
    stages pad with -inf). Measured 35% faster STANDALONE on v5e at the
    stem shape (tools/profile_maxpool.py: 6.81 -> 4.44 ms incl. producer;
    slice-max variant loses at 15.3) but NEGATIVE IN-MODEL
    (tools/profile_sep_pool.py, interleaved A/B 2026-08-20: bs=8 clip
    88.5 vs 87.4 fps, reproduced twice): in the model XLA fuses the 2-D
    reduce_window with its batch-minor-layout producer, while the
    separable pair must round-trip the (32, 128, 320, 64) row-max
    intermediate through HBM — the fusion it breaks is worth more than
    the window reuse it adds. Default therefore stays on the 2-D pool;
    STSWIN_SEP_POOL=1 opts into the separable route (read at trace
    time), kept as the measured record with its bit-equality test."""
    import os
    if os.environ.get("STSWIN_SEP_POOL", "0") != "1":
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))
    x = nn.max_pool(x, (3, 1), strides=(2, 1), padding=((1, 1), (0, 0)))
    return nn.max_pool(x, (1, 3), strides=(1, 2), padding=((0, 0), (1, 1)))


class _ConvKernelParam(nn.Module):
    """nn.Conv-compatible `kernel` param (same tree as a bias-free Conv)
    for paths that consume the weight directly."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", torch_conv_kernel_init, self.shape,
                          jnp.float32)


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm, torch-padding semantics.

    `s2d_stem` routes a 7x7/s2 conv through the space-to-depth
    reformulation (`ops/stem_s2d.py`) on TPU — XLA's direct lowering runs
    the 3-channel stem at ~12% MFU; the 12-channel 4x4/s1 equivalent is the
    same math in MXU-friendly channel groups. Param tree unchanged
    (`conv/kernel` stays torch-shaped)."""

    features: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        from stswincl_tpu.ops.stem_s2d import (stem_s2d_applicable,
                                               stem_s2d_conv)
        if self.s2d_stem and stem_s2d_applicable(x, self.kernel, self.stride):
            w = _ConvKernelParam(
                (self.kernel, self.kernel, x.shape[-1], self.features),
                name="conv")()
            x = stem_s2d_conv(x, w, self.dtype)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPSILON,
                dtype=jnp.float32,
                name="bn",
            )(x)
            return x.astype(self.dtype)
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            kernel_init=torch_conv_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,  # torch momentum 0.1 == flax 0.9
            epsilon=BN_EPSILON,
            dtype=jnp.float32,
            name="bn",
        )(x)
        return x.astype(self.dtype)


class BasicBlock(nn.Module):
    """Reference BasicBlock (`resnet.py:22-53`): two 3x3 convs + projection
    shortcut when shape changes."""

    channels: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        in_ch = x.shape[-1]
        out = ConvBN(self.channels, 3, self.stride, self.dilation, self.dtype, name="cb1")(x, train)
        out = nn.relu(out)
        out = ConvBN(self.channels, 3, 1, self.dilation, self.dtype, name="cb2")(out, train)
        if self.stride != 1 or in_ch != self.channels:
            sc = ConvBN(self.channels, 1, self.stride, 1, self.dtype, name="downsample")(x, train)
        else:
            sc = x
        return nn.relu(out + sc)


class BottleneckBlock(nn.Module):
    """Reference Bottleneck (`pixcontrast_18/contrast/models/Ours/resnet.py:
    55-90`): 1x1 reduce -> 3x3 (stride/dilated) -> 1x1 expand x4, projection
    shortcut on shape change."""

    channels: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        in_ch = x.shape[-1]
        out_ch = 4 * self.channels
        out = ConvBN(self.channels, 1, 1, 1, self.dtype, name="cb1")(x, train)
        out = nn.relu(out)
        out = ConvBN(self.channels, 3, self.stride, self.dilation, self.dtype,
                     name="cb2")(out, train)
        out = nn.relu(out)
        out = ConvBN(out_ch, 1, 1, 1, self.dtype, name="cb3")(out, train)
        if self.stride != 1 or in_ch != out_ch:
            sc = ConvBN(out_ch, 1, self.stride, 1, self.dtype,
                        name="downsample")(x, train)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet50OS16(nn.Module):
    """Output-stride-16 ResNet50 (`pixcontrast resnet.py:92-133`): stem +
    layer1-3 of torchvision resnet50 (OS16, 1024ch) + a dilated (rate 2)
    Bottleneck stage to 2048ch. Backs the `layers=50` DeepLabV3+ baseline.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = ConvBN(64, 7, 2, 1, self.dtype, s2d_stem=True,
                   name="stem")(x, train)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)
        for i in range(3):
            x = BottleneckBlock(64, dtype=self.dtype, name=f"layer1_{i}")(x, train)
        x = BottleneckBlock(128, stride=2, dtype=self.dtype, name="layer2_0")(x, train)
        for i in range(1, 4):
            x = BottleneckBlock(128, dtype=self.dtype, name=f"layer2_{i}")(x, train)
        x = BottleneckBlock(256, stride=2, dtype=self.dtype, name="layer3_0")(x, train)
        for i in range(1, 6):
            x = BottleneckBlock(256, dtype=self.dtype, name=f"layer3_{i}")(x, train)
        # dilated final stage replacing strided layer4 (`resnet.py:122`)
        for i in range(3):
            x = BottleneckBlock(512, dilation=2, dtype=self.dtype,
                                name=f"layer5_{i}")(x, train)
        return x


class ResNet18OS8(nn.Module):
    """Output-stride-8 ResNet18: (N, H, W, 3) -> (N, H/8, W/8, 8*width).

    `width` (default 64, the reference dimensioning) scales every stage —
    useful for scaled-down model variants and fast integration tests.
    """

    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        x = x.astype(self.dtype)
        # torchvision stem: conv7x7/2 pad3 -> bn -> relu -> maxpool3x3/2 pad1
        x = ConvBN(w, 7, 2, 1, self.dtype, s2d_stem=True,
                   name="stem")(x, train)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)
        # layer1: 2x BasicBlock(w), layer2: 2x BasicBlock(2w, stride 2)
        for i in range(2):
            x = BasicBlock(w, dtype=self.dtype, name=f"layer1_{i}")(x, train)
        x = BasicBlock(2 * w, stride=2, dtype=self.dtype, name="layer2_0")(x, train)
        x = BasicBlock(2 * w, dtype=self.dtype, name="layer2_1")(x, train)
        # dilated stages replacing strided layer3/layer4 (reference layer4/5,
        # `resnet.py:120-122`): OS stays 8, receptive field grows.
        x = BasicBlock(4 * w, dilation=2, dtype=self.dtype, name="layer4_0")(x, train)
        x = BasicBlock(4 * w, dilation=2, dtype=self.dtype, name="layer4_1")(x, train)
        x = BasicBlock(8 * w, dilation=4, dtype=self.dtype, name="layer5_0")(x, train)
        x = BasicBlock(8 * w, dilation=4, dtype=self.dtype, name="layer5_1")(x, train)
        return x
