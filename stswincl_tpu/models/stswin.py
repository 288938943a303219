"""TswinPlus segmentation model and DeepLabV3+ baseline.

Parity with `/root/reference/seg18/net/Ours/base18.py:14-119` (and its
pretrain/CaDIS twins `contrast/models/Ours/base.py:75-143`,
`segcata/net/Ours/base_cata_np.py:49-116`, which are the same network
parameterized by resolution/class count — implemented once here).

Forward (clip of T=4 frames, NHWC):
  frames -> ResNet18-OS8 (batched over B*T, not a python frame loop)
         -> SwinTemporalStack (stage1 @ OS8 512ch, stage2 @ OS16 1024ch)
         -> last-frame slices of resnet/stage1/stage2
         -> ASPP(stage2_last) -> 256ch
         -> 1x1 ConvBNReLU projections of the three feature maps to 48ch
         -> upsample stage2/ASPP maps to OS8, concat (48*3 + 256 = 400)
         -> classifier conv3x3(400->256)+BN+ReLU, conv1x1(->classes)
         -> bilinear upsample to input resolution.

`return_features=True` exposes the pre-classifier 400-channel concat map,
which is exactly the representation the contrastive stage projects
(`PixPro_swin_v5.py:318-328`) — the reference rebuilds the whole forward in
PixPro by hand; here it is one flag.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import flax.linen as nn

from stswincl_tpu.models.norm import BN_MOMENTUM, BN_EPSILON

from stswincl_tpu.models.resnet import ResNet18OS8, ResNet50OS16
from stswincl_tpu.models.swin import SwinTemporalStack
from stswincl_tpu.models.aspp import ASPP
from stswincl_tpu.ops.resize import resize_bilinear
from stswincl_tpu.models.init import torch_conv_kernel_init, torch_bias_init

Dtype = Any


class ProjectBNRelu(nn.Module):
    """1x1 conv (no bias) + BN + ReLU projection to 48ch (`base18.py:60-71`)."""

    features: int = 48
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=torch_conv_kernel_init,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPSILON,
                         dtype=jnp.float32, name="bn")(x)
        return nn.relu(x.astype(self.dtype))


class Classifier(nn.Module):
    """conv3x3(no bias)+BN+ReLU -> conv1x1(num_classes) (`base18.py:73-77`)."""

    num_classes: int
    hidden: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.hidden, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    kernel_init=torch_conv_kernel_init,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPSILON,
                         dtype=jnp.float32, name="bn")(x)
        x = nn.relu(x.astype(self.dtype))
        x = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                    kernel_init=torch_conv_kernel_init,
                    bias_init=torch_bias_init(x.shape[-1]),
                    dtype=self.dtype, name="conv2")(x)
        return x


class TswinPlus(nn.Module):
    """The STswin segmentation network (flagship model).

    Input: (B, T=4, H, W, 3) float clip, NHWC frames.
    Output: (B, H, W, num_classes) logits (last frame segmented), fp32.
    """

    num_classes: int
    swin_dim: int = 512
    num_heads: int = 4
    attn_impl: str = "auto"
    gelu_exact: bool = True
    remat: bool = False
    # only the last frame's stage outputs feed the heads, so the dead
    # (0, 2) group of the final stage-2 layer is skipped by default (~8%
    # of swin-stack FLOPs); logits are unchanged (tests/test_models.py)
    final_pair_only: bool = True
    # swin layers per stage; (3, 3) = reference. Smaller only for
    # compile-light dryrun/test configs (see SwinTemporalStack.depths).
    swin_depths: Tuple[int, int] = (3, 3)
    dtype: Dtype = jnp.float32

    def trunk(self, x, train: bool):
        """Shared encoder trunk -> 400-channel OS8 feature map."""
        B, T, H, W, C = x.shape
        h8, w8 = H // 8, W // 8

        # one batched backbone pass over all frames (B*T folded into batch)
        frames = x.reshape(B * T, H, W, C)
        feats = ResNet18OS8(width=self.swin_dim // 8, dtype=self.dtype,
                            name="resnet")(frames, train)
        feats = feats.reshape(B, T, h8, w8, self.swin_dim)
        res_last = feats[:, -1]

        stage1, stage2 = SwinTemporalStack(
            dim=self.swin_dim, input_resolution=(h8, w8),
            num_heads=self.num_heads, attn_impl=self.attn_impl,
            gelu_exact=self.gelu_exact, remat=self.remat,
            final_pair_only=self.final_pair_only, depths=self.swin_depths,
            dtype=self.dtype, name="swin",
        )(feats)
        s1_last = stage1[:, -1]           # (B, h8, w8, 512)
        s2_last = stage2[:, -1]           # (B, h8/2, w8/2, 1024)

        aspp_out = ASPP(self.swin_dim * 2, 256, dtype=self.dtype, name="aspp")(
            s2_last, train)

        p1 = ProjectBNRelu(dtype=self.dtype, name="project1")(res_last, train)
        p2 = ProjectBNRelu(dtype=self.dtype, name="project2")(s1_last, train)
        p3 = ProjectBNRelu(dtype=self.dtype, name="project3")(s2_last, train)
        p3 = resize_bilinear(p3, h8, w8)
        aspp_up = resize_bilinear(aspp_out, h8, w8)

        return jnp.concatenate([p1, p2, p3, aspp_up], axis=-1)  # (B,h8,w8,400)

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False,
                 channels_first_logits: bool = False,
                 head_res_logits: bool = False):
        B, T, H, W, _ = x.shape
        features = self.trunk(x, train)
        if return_features:
            return features
        logits = Classifier(self.num_classes, dtype=self.dtype, name="classifier")(
            features, train)
        if head_res_logits:
            # eval fast path: hand the RAW (B, C, H/8, W/8) channels-first
            # logits to the caller, which composes the model's bilinear
            # upsample (`base18.py:106`) with the eval-protocol resize
            # (`seg18/test.py:155`) into ONE pair of interpolation matrices
            # (`ops.resize.composed_upsample_argmax_cf`) — the two resizes
            # are linear maps, so their matrices multiply exactly. The
            # transpose happens at head resolution (~25x cheaper than at
            # input resolution, where NHWC C=classes lane-pads 10.7x).
            return jnp.transpose(logits.astype(jnp.float32), (0, 3, 1, 2))
        if channels_first_logits:
            # training-loss layout: keep the (small) class axis OUT of the
            # lane dimension — NHWC fp32 logits at full resolution pad
            # num_classes -> 128 lanes (measured 10.7x HBM expansion);
            # transposing at feature resolution first is nearly free. The
            # upsample runs as interpolation-matrix matmuls so forward AND
            # backward are MXU contractions (the gather-based resize's
            # transpose measured ~40 ms/step in the training trace).
            from stswincl_tpu.ops.resize import resize_bilinear_cf_matmul
            lcf = jnp.transpose(logits.astype(jnp.float32), (0, 3, 1, 2))
            return resize_bilinear_cf_matmul(lcf, H, W)
        logits = resize_bilinear(logits.astype(jnp.float32), H, W)
        return logits


class DeepLabV3Plus(nn.Module):
    """Single-frame DeepLabV3+ baseline (`base18.py:14-49`), used by the
    reference's `--arch puredeeplab18` ResNet-init pre-stage (`exp.sh:3-8`).

    Note: as shipped the reference wires the 1024-ch ASPP against a 512-ch
    backbone (shape bug, SURVEY.md §2.2); here the 512-ch ASPP variant is
    wired, matching the only shape-consistent configuration
    (`ASPP_deeplab2.py`).
    """

    num_classes: int
    layers: int = 18  # 18 -> ResNet18-OS8; 50 -> ResNet50-OS16 + 256-branch ASPP
    width: int = 64   # ResNet stage width (64 = reference dimensioning)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 head_res_logits: bool = False):
        if x.ndim == 5:  # clip input: segment the last frame (t=1 clips too)
            x = x[:, -1]
        B, H, W, _ = x.shape
        if self.layers == 50:
            feats = ResNet50OS16(dtype=self.dtype, name="resnet")(x, train)
            aspp_out = ASPP(2048, 256, mid_channels=256, dtype=self.dtype,
                            name="aspp")(feats, train)
        else:
            feats = ResNet18OS8(width=self.width, dtype=self.dtype,
                                name="resnet")(x, train)
            aspp_out = ASPP(8 * self.width, 256, dtype=self.dtype,
                            name="aspp")(feats, train)
        low = ProjectBNRelu(dtype=self.dtype, name="project")(feats, train)
        aspp_out = resize_bilinear(aspp_out, low.shape[1], low.shape[2])
        out = Classifier(self.num_classes, dtype=self.dtype, name="classifier")(
            jnp.concatenate([low, aspp_out], axis=-1), train)
        if head_res_logits:
            # same eval fast-path contract as TswinPlus: raw channels-first
            # head-res logits; caller composes the resizes
            return jnp.transpose(out.astype(jnp.float32), (0, 3, 1, 2))
        return resize_bilinear(out.astype(jnp.float32), H, W)
