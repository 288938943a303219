"""Streaming video inference with a backbone feature cache.

The reference test loop (`seg18/test.py:148-160`) re-runs the ResNet
backbone on all 4 clip frames for EVERY output frame, although consecutive
clips share 3 of their 4 frames. The backbone is ~60% of total FLOPs, so a
rolling per-frame feature cache makes steady-state video serving ~2.2x
cheaper: each new frame costs ONE backbone pass + the (uncacheable — its
attention mixes frames) swin/head stack.

This is a serving-path capability beyond the reference with identical
numerics: `predict_next` == the full-clip forward over the same 4 frames
(`tests/test_streaming.py`).

Beyond the backbone, HALF of swin layer 0 rides a cache too: layer 0's
temporal schedule groups frames ((0, 1), (2, 3)), and its group computation
has no absolute-position input — so the (0, 1) group of the current clip is
bit-identical to the (2, 3) group computed two steps earlier. The step
computes only the fresh (2, 3) group and carries a two-deep group-output
ring (`g_a`, `g_b`). Later layers can't be cached: their inputs mix frames
whose values are clip-alignment-dependent (e.g. frame t-2 after layer 1 was
joined with t-3 in the previous clip but with t-1 in this one).

Implementation: two thin flax modules (`_Backbone`, `_Head`) declare the
same-named submodules as `TswinPlus` (resnet / swin / aspp / project1-3 /
classifier), so the trained TswinPlus variable tree feeds both directly.
The cache is a shape-static (B, T, h8, w8, C) ring (shift + append), so the
step function jits once.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from stswincl_tpu.models.resnet import ResNet18OS8
from stswincl_tpu.models.swin import SwinTemporalStack
from stswincl_tpu.models.aspp import ASPP
from stswincl_tpu.models.stswin import ProjectBNRelu, Classifier
from stswincl_tpu.ops.resize import (
    composed_upsample_argmax_cf, resize_bilinear)


class _Backbone(nn.Module):
    swin_dim: int
    dtype: object

    @nn.compact
    def __call__(self, frames):
        return ResNet18OS8(width=self.swin_dim // 8, dtype=self.dtype,
                           name="resnet")(frames, False)


class _Head(nn.Module):
    num_classes: int
    swin_dim: int
    num_heads: int
    attn_impl: str
    dtype: object
    swin_depths: Tuple[int, int] = (3, 3)
    gelu_exact: bool = True

    @nn.compact
    def __call__(self, feats, layer0_cached=None, layer0_only: bool = False):
        B, T, h8, w8, C = feats.shape
        swin = SwinTemporalStack(
            dim=self.swin_dim, input_resolution=(h8, w8),
            num_heads=self.num_heads, attn_impl=self.attn_impl,
            depths=tuple(self.swin_depths), gelu_exact=self.gelu_exact,
            final_pair_only=True,  # only [:, -1] is consumed below
            dtype=self.dtype, name="swin")
        if layer0_only:
            # seed the streaming layer-0 group cache (see SwinTemporalStack)
            return swin(feats, layer0_only=True)
        res_last = feats[:, -1]
        if layer0_cached is not None:
            stage1, stage2, g_new = swin(feats, layer0_cached=layer0_cached)
        else:
            stage1, stage2 = swin(feats)
            g_new = None
        s1_last, s2_last = stage1[:, -1], stage2[:, -1]
        aspp_out = ASPP(self.swin_dim * 2, 256, dtype=self.dtype,
                        name="aspp")(s2_last, False)
        p1 = ProjectBNRelu(dtype=self.dtype, name="project1")(res_last, False)
        p2 = ProjectBNRelu(dtype=self.dtype, name="project2")(s1_last, False)
        p3 = ProjectBNRelu(dtype=self.dtype, name="project3")(s2_last, False)
        p3 = resize_bilinear(p3, h8, w8)
        aspp_up = resize_bilinear(aspp_out, h8, w8)
        feats400 = jnp.concatenate([p1, p2, p3, aspp_up], axis=-1)
        logits = Classifier(self.num_classes, dtype=self.dtype,
                            name="classifier")(feats400, False)
        # raw channels-first head-res logits: the model's input-resolution
        # upsample is composed into the eval resize by the step function
        # (`composed_upsample_argmax_cf`), so it never materializes
        lcf = jnp.transpose(logits.astype(jnp.float32), (0, 3, 1, 2))
        if g_new is not None:
            return lcf, g_new
        return lcf


def _split_variables(variables, keys):
    out = {}
    for coll, tree in variables.items():
        sub = {k: v for k, v in tree.items() if k in keys}
        if sub:
            out[coll] = sub
    return out


class StreamingSegmenter:
    """Feature-cached per-frame segmentation over a video stream.

    Usage:
        seg = StreamingSegmenter(model, variables, out_hw=(1024, 1280))
        cache = seg.init_cache(first_clip)          # (B, T, H, W, 3) warmup
        for frame in stream:                        # (B, H, W, 3)
            cache, pred = seg.predict_next(cache, frame)
    """

    HEAD_KEYS = ("swin", "aspp", "project1", "project2", "project3",
                 "classifier")

    def __init__(self, model, variables, out_hw: Optional[Tuple[int, int]] = None,
                 align_out: bool = True):
        """align_out: align_corners semantics of the eval-protocol resize to
        `out_hw` — True for EndoVis (`seg18/test.py:155`), False for CaDIS
        (`segcata/cata_test.py:129`)."""
        self.out_hw = out_hw
        # fp32 models get the fp32 resize+argmax (no bf16 demotion at
        # near-tie pixels); bf16 serving keeps the fast kernel — mirrors
        # make_seg_eval_step so streamed == full-clip stays bit-equal
        exact = model.dtype == jnp.float32
        backbone = _Backbone(model.swin_dim, model.dtype)
        head = _Head(model.num_classes, model.swin_dim, model.num_heads,
                     model.attn_impl, model.dtype,
                     swin_depths=tuple(model.swin_depths),
                     gelu_exact=model.gelu_exact)
        self._bb_vars = _split_variables(variables, ("resnet",))
        self._head_vars = _split_variables(variables, self.HEAD_KEYS)

        # variables are ARGUMENTS, not closures: closed-over param trees
        # are baked into the HLO as literals (~240MB compile payload for
        # the full model — rejected by the remote-compile relay with 413)
        @jax.jit
        def _init_cache(bb_vars, head_vars, clip):
            B, T, H, W, C = clip.shape
            feats = backbone.apply(bb_vars, clip.reshape(B * T, H, W, C))
            feats = feats.reshape(B, T, *feats.shape[1:])
            # layer-0 group cache (see SwinTemporalStack.__call__): g_a is
            # layer 0 on frames (1, 2) — the (0, 2) group of the NEXT
            # clip — g_b on frames (2, 3) — the (0, 2) group of the clip
            # after that. Each step consumes g_a and appends the fresh
            # (2, 4) group output.
            g_a = head.apply(head_vars, feats[:, 1:3], layer0_only=True)
            g_b = head.apply(head_vars, feats[:, 2:4], layer0_only=True)
            return feats, g_a, g_b

        @jax.jit
        def _init_and_predict(bb_vars, head_vars, clip):
            B, T, H, W, C = clip.shape
            feats = backbone.apply(bb_vars, clip.reshape(B * T, H, W, C))
            feats = feats.reshape(B, T, *feats.shape[1:])
            g_a = head.apply(head_vars, feats[:, 1:3], layer0_only=True)
            g_b = head.apply(head_vars, feats[:, 2:4], layer0_only=True)
            lcf = head.apply(head_vars, feats)
            mid = (lcf.shape[2] * 8, lcf.shape[3] * 8)
            hw = out_hw if out_hw is not None else mid
            pred = composed_upsample_argmax_cf(lcf, mid, hw,
                                               align_out=align_out,
                                               exact=exact)
            return (feats, g_a, g_b), pred

        @jax.jit
        def _step(bb_vars, head_vars, cache, frame):
            feats, g_a, g_b = cache
            new_feat = backbone.apply(bb_vars, frame)  # (B, h8, w8, C)
            feats = jnp.concatenate([feats[:, 1:], new_feat[:, None]], axis=1)
            # (B, C, h8, w8) logits + the fresh layer-0 (2, 4) group output
            lcf, g_new = head.apply(head_vars, feats, layer0_cached=g_a)
            mid = (lcf.shape[2] * 8, lcf.shape[3] * 8)
            hw = out_hw if out_hw is not None else mid
            pred = composed_upsample_argmax_cf(lcf, mid, hw,
                                               align_out=align_out,
                                               exact=exact)
            return (feats, g_b, g_new), pred

        self._init_cache_fn = _init_cache
        self._init_and_predict_fn = _init_and_predict
        self._step_fn = _step

    def init_cache(self, clip: jnp.ndarray):
        """Warm the cache with a full (B, T, H, W, 3) clip."""
        return self._init_cache_fn(self._bb_vars, self._head_vars, clip)

    def init_and_predict(self, clip: jnp.ndarray):
        """Warm the cache AND segment the clip's last frame in one pass —
        the cache seeding shares the backbone forward with the prediction,
        so a non-sliding frame (sequence start) costs one clip forward, not
        two. Returns (cache, prediction)."""
        return self._init_and_predict_fn(self._bb_vars, self._head_vars, clip)

    def predict_next(self, cache, frame: jnp.ndarray):
        """Advance the stream by one (B, H, W, 3) frame; returns
        (new_cache, prediction)."""
        return self._step_fn(self._bb_vars, self._head_vars, cache, frame)
