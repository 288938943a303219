"""Space-time shifted-window Swin stack ("STswin").

Capability parity with `/root/reference/seg18/net/Ours/swin_512.py:143-327`
(and its pretrain twin, which differs only by `input_resolution`). Two
semantic quirks of the reference are deliberately replicated — "fixing" them
to standard Swin silently changes results (SURVEY.md §7 risks):

  * **Nonstandard norm order** (`swin_512.py:234-235`): the attention branch
    has NO pre-norm (`x = shortcut + attn(x)`), and norm1 is applied AFTER
    the MLP residual add: ``x = norm1(x + mlp(norm2(x)))``.
  * **Temporal pairing schedule** (`swin_512.py:287,302-307`): each of the 3
    layers per stage attends jointly over 2-frame groups with the schedule
    [[0:2, 2:4], [1:3], [0:2, 2:4]]; frames outside the active pair pass
    through unchanged.

TPU-first restructuring (not a translation):
  * the reference loops over pairs and mutates a cloned tensor; here the
    [0:2, 2:4] schedule is a single reshape (B, 4, ...) -> (B*2, 2, ...) so
    both pairs run in one batched attention call, and the [1:3] layer is a
    static slice + concat — everything shape-static under jit;
  * window partitioning is pure reshape/transpose that XLA folds into the
    attention matmuls; the SW-MSA mask and relative-position index are
    host-precomputed constants;
  * attention math runs through
    :func:`stswincl_tpu.ops.attention.space_time_window_attention` with fp32
    accumulation, bf16-safe.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from stswincl_tpu.ops.window import (
    cyclic_shift,
    relative_position_index,
    shifted_window_attention_mask,
)
from stswincl_tpu.ops.attention import space_time_window_attention
from stswincl_tpu.ops.pallas_attention import space_time_window_attention_fused
from stswincl_tpu.models.init import torch_dense_kernel_init, torch_bias_init

Dtype = Any


class Mlp(nn.Module):
    """fc -> GELU -> fc  (`swin_512.py:7-23`; drop rates are 0 in all
    shipped configs so dropout is omitted).

    `gelu_exact=True` matches torch nn.GELU (erf); False uses the tanh
    approximation — measurably cheaper on the VPU (exact erf accounts for a
    chunk of the elementwise time in the device trace) at ~1e-3 activation
    deviation; a serving-mode option, off by default for parity."""

    hidden: int
    out: int
    gelu_exact: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from stswincl_tpu.ops.pallas_attention import _is_tpu_backend

        if _is_tpu_backend():
            # fused fc1+GELU+fc2: the hidden activations and their GELU
            # round trip (~250MB/block) stay in VMEM (ops/pallas_mlp.py)
            from stswincl_tpu.ops.pallas_mlp import fused_mlp
            C = x.shape[-1]
            w1, b1 = _LinearParams(C, self.hidden, name="fc1")()
            w2, b2 = _LinearParams(self.hidden, self.out, name="fc2")()
            return fused_mlp(x.astype(self.dtype), w1, b1, w2, b2,
                             self.gelu_exact)
        x = nn.Dense(self.hidden, kernel_init=torch_dense_kernel_init,
                     bias_init=torch_bias_init(x.shape[-1]),
                     dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=not self.gelu_exact)
        x = nn.Dense(self.out, kernel_init=torch_dense_kernel_init,
                     bias_init=torch_bias_init(x.shape[-1]),
                     dtype=self.dtype, name="fc2")(x)
        return x


class _LinearParams(nn.Module):
    """Declares nn.Dense-compatible params (kernel, bias) without computing —
    used when a fused kernel consumes the weights directly while keeping the
    variable tree identical to the Dense-based paths."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_dense_kernel_init,
                            (self.in_features, self.out_features), jnp.float32)
        bias = self.param("bias", torch_bias_init(self.in_features),
                          (self.out_features,), jnp.float32)
        return kernel, bias


class _MlpParams(nn.Module):
    """Declares the Mlp's fc1/fc2 params (same tree as :class:`Mlp`) for
    consumption by the block-level fused add+LN+MLP kernel."""

    in_features: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = _LinearParams(self.in_features, self.hidden, name="fc1")()
        w2, b2 = _LinearParams(self.hidden, self.in_features, name="fc2")()
        return w1, b1, w2, b2


class _KernelParam(nn.Module):
    """A bias-free nn.Dense-compatible `kernel` param (same tree as
    `nn.Dense(use_bias=False)`) for fused kernels that consume the weight
    directly."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", torch_dense_kernel_init,
                          (self.in_features, self.out_features), jnp.float32)


class _NormParams(nn.Module):
    """nn.LayerNorm-compatible (scale, bias) params for fused norm kernels."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        return scale, bias


def resolve_attn_impl(attn_impl: str, in_dim: int, dim: int, dtype) -> str:
    """Resolve 'auto' and the pallas_full VMEM-fit fallback — shared by
    WindowAttention and SpaceTimeSwinBlock so both sides of the roll-free
    SW-MSA contract agree on the route."""
    impl = attn_impl
    if impl == "auto":
        # measured on v5e (tools/profile_swin_pallas.py), full stack:
        # pallas_full 14.5 ms < pallas 15.0 < einsum 17.7; einsum is the
        # off-TPU fallback.
        from stswincl_tpu.ops.pallas_attention import _is_tpu_backend
        impl = "pallas_full" if _is_tpu_backend() else "einsum"
    if impl == "pallas_full":
        # the resident qkv+proj weights must fit VMEM alongside the row
        # tiles: at C=1024 in fp32 they alone are 16 MB (measured
        # compile-time VMEM OOM) — fall back to the weights-in-HBM
        # image kernel for large-C fp32 configs.
        # 10MB: bf16 stage-2 (8.4MB resident) fits and measured fastest;
        # fp32 stage-2 (16.8MB) cannot fit a 16MB VMEM
        itemsize = jnp.dtype(dtype).itemsize
        weights_bytes = (in_dim * 3 * dim + dim * dim) * itemsize
        if weights_bytes > 10 * 1024 * 1024:
            impl = "pallas"
    return impl


class WindowAttention(nn.Module):
    """QKV + relative-position-bias window attention on an image-layout
    clip (B, T, H, W, C) -> (B, T, H, W, C); input is already cyclically
    shifted for SW-MSA. Partitioning happens inside, per implementation:

    `attn_impl`:
      * 'einsum' — partition via reshapes XLA folds into the matmuls, score
        tensor materialized in HBM (the robust default);
      * 'pallas' — the image-layout fused kernel: one grid cell per window
        reads the (T, ws, ws, 3C) qkv tile (partition == BlockSpec),
        computes fp32 scores/softmax in VMEM, writes the output tile back
        in image layout (reverse for free);
      * 'pallas_windows' — the earlier per-window-tile kernel (kept for
        comparison);
      * 'pallas_full' — the whole sub-block (qkv -> attention -> proj) in
        one kernel with VMEM-resident weights;
      * 'auto' — pallas_full on TPU (14.5 vs 15.0 vs 17.7 ms full-stack
        measurements), einsum elsewhere.
    """

    dim: int
    window_size: Tuple[int, int]
    num_heads: int
    attn_impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, shift: int = 0, raw_params: bool = False):
        """`shift` > 0 selects the roll-free SW-MSA path: x is UNSHIFTED
        and the fused kernel performs the cyclic shift in VMEM; the output
        stays in shifted layout (the caller's epilogue absorbs the inverse).
        Only valid when the routing resolves to 'pallas_full' — use
        `resolve_attn_impl` before asking for it.

        `raw_params=True` (pallas_full route only) creates the same
        variable tree but returns the raw tensors
        (wqkv, bqkv, wproj, bproj, bias_tiled, mask_tiled) for a caller
        that fuses attention into a larger kernel
        (`pallas_swin_block.fused_whole_swin_block`)."""
        B, T, H, W, C = x.shape
        ws = self.window_size[0]
        nH, nW_ = H // ws, W // ws
        n_windows = nH * nW_
        N = ws * ws
        TN = T * N
        heads = self.num_heads
        head_dim = self.dim // heads
        scale = head_dim ** -0.5

        num_rel = (2 * self.window_size[0] - 1) * (2 * self.window_size[1] - 1)
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            (num_rel, heads),
            jnp.float32,
        )
        rel_idx = relative_position_index(*self.window_size)  # host constant
        rel_bias = bias_table[rel_idx.reshape(-1)].reshape(N, N, heads)
        rel_bias = rel_bias.transpose(2, 0, 1)  # (heads, N, N)

        impl = resolve_attn_impl(self.attn_impl, C, self.dim, self.dtype)
        assert shift == 0 or impl == "pallas_full", (
            "shift-in-kernel is only implemented by the pallas_full route")
        assert not raw_params or impl == "pallas_full", (
            "raw_params is only meaningful on the pallas_full route")

        if impl == "pallas_full":
            # whole sub-block (qkv -> attention -> proj) in one kernel with
            # VMEM-resident weights; same variable tree as the Dense paths
            from stswincl_tpu.ops.pallas_block_attention import (
                fused_swin_block_attention)
            wqkv, bqkv = _LinearParams(C, 3 * self.dim, name="qkv")()
            wproj, bproj = _LinearParams(self.dim, self.dim, name="proj")()
            bias_tiled = jnp.tile(rel_bias.astype(jnp.float32), (1, T, T))
            if mask is None:
                mask_tiled = jnp.zeros((1, TN, TN), jnp.float32)
            else:
                mask_tiled = jnp.tile(mask.astype(jnp.float32), (1, T, T))
            if raw_params:
                return wqkv, bqkv, wproj, bproj, bias_tiled, mask_tiled
            return fused_swin_block_attention(
                x.astype(self.dtype), wqkv, bqkv, wproj, bproj,
                bias_tiled, mask_tiled, heads, scale, ws, shift)

        # pointwise qkv on the image layout (commutes with partitioning)
        qkv = nn.Dense(3 * self.dim, use_bias=True,
                       kernel_init=torch_dense_kernel_init,
                       bias_init=torch_bias_init(C),
                       dtype=self.dtype, name="qkv")(x)

        if impl == "pallas":
            from stswincl_tpu.ops.pallas_block_attention import (
                windowed_attention_image)
            bias_tiled = jnp.tile(rel_bias.astype(jnp.float32), (1, T, T))
            if mask is None:
                mask_tiled = jnp.zeros((1, TN, TN), jnp.float32)
            else:
                mask_tiled = jnp.tile(mask.astype(jnp.float32), (1, T, T))
            out = windowed_attention_image(qkv, bias_tiled, mask_tiled,
                                           heads, scale, ws)
        else:
            # partition the qkv tensor to frame-joint windows
            xw = qkv.reshape(B, T, nH, ws, nW_, ws, 3 * C)
            xw = xw.transpose(0, 2, 4, 1, 3, 5, 6)
            xw = xw.reshape(B * n_windows, TN, 3, heads, head_dim)
            xw = xw.transpose(2, 0, 3, 1, 4)  # (3, Bw, heads, TN, hd)
            q, k, v = xw[0], xw[1], xw[2]
            if impl == "pallas_windows":
                out = space_time_window_attention_fused(
                    q, k, v, rel_bias, mask, scale, use_pallas=True)
            else:
                out = space_time_window_attention(q, k, v, rel_bias, mask,
                                                  scale)
            # reverse to image layout
            out = out.transpose(0, 2, 1, 3)  # (Bw, TN, heads, hd)
            out = out.reshape(B, nH, nW_, T, ws, ws, C)
            out = out.transpose(0, 3, 1, 4, 2, 5, 6).reshape(B, T, H, W, C)

        out = nn.Dense(self.dim, kernel_init=torch_dense_kernel_init,
                       bias_init=torch_bias_init(C),
                       dtype=self.dtype, name="proj")(out)
        return out


class SpaceTimeSwinBlock(nn.Module):
    """One (S)W-MSA block over a 2-frame group: (B, 2, L, C) -> (B, 2, L, C).

    Replicates reference `SwinTransformerBlock.forward` (`swin_512.py:
    196-237`) including the nonstandard norm order.
    """

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 4.0
    attn_impl: str = "auto"
    gelu_exact: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, out_frame: Optional[int] = None):
        """out_frame: dead-compute skip for eval (`final_pair_only`) — only
        this group-frame index's output is consumed downstream, so the
        post-attention epilogue (residual+LN+MLP, the block's dominant
        cost) runs on that frame's rows alone and the return is
        (B, 1, L, C). Attention still spans both frames (the live frame's
        queries attend to both frames' keys/values)."""
        H, W = self.input_resolution
        ws, ss = self.window_size, self.shift_size
        # reference clamps window to the input when it is small (`:155-158`)
        if min(H, W) <= ws:
            ss, ws = 0, min(H, W)
        B, T, L, C = x.shape
        assert L == H * W, f"input feature has wrong size: {L} != {H}*{W}"
        nH, nW_ = H // ws, W // ws
        n_windows = nH * nW_
        N = ws * ws

        shortcut = x

        if ss > 0:
            mask = jnp.asarray(
                shifted_window_attention_mask(H, W, ws, ss), dtype=jnp.float32
            )
        else:
            mask = None

        from stswincl_tpu.ops.pallas_attention import _is_tpu_backend
        # whole-block fusion (W-MSA): qkv -> attention -> proj -> residual
        # -> LN2 -> MLP -> LN1 as ONE kernel — x is read once and the block
        # output written once, instead of the five per-block HBM touches of
        # the attention+epilogue pair. OPT-IN (STSWIN_WHOLE_BLOCK=1): the
        # fusion measured 3-4% slower end to end than the pair — the block
        # is compute-bound and the pair pipelines better (see the measured
        # negative result in ops/pallas_swin_block.py)
        if (ss == 0 and out_frame is None and _is_tpu_backend()
                and resolve_attn_impl(self.attn_impl, C, self.dim,
                                      self.dtype) == "pallas_full"):
            from stswincl_tpu.ops.pallas_swin_block import (
                fused_whole_swin_block, whole_block_applicable)
            hidden = int(self.dim * self.mlp_ratio)
            if whole_block_applicable((B, T, H, W, C), self.dtype, self.dim,
                                      hidden, ws, ss, out_frame):
                xi = x.astype(self.dtype).reshape(B, T, H, W, C)
                wqkv, bqkv, wproj, bproj, bias_tiled, mask_tiled = \
                    WindowAttention(
                        self.dim, (ws, ws), self.num_heads,
                        attn_impl=self.attn_impl, dtype=self.dtype,
                        name="attn")(xi, mask, raw_params=True)
                s2, b2 = _NormParams(self.dim, name="norm2")()
                s1, b1n = _NormParams(self.dim, name="norm1")()
                w1, bw1, w2, bw2 = _MlpParams(self.dim, hidden,
                                              name="mlp")()
                out = fused_whole_swin_block(
                    xi, wqkv, bqkv, wproj, bproj, bias_tiled, mask_tiled,
                    s2, b2, w1, bw1, w2, bw2, s1, b1n, self.num_heads,
                    (self.dim // self.num_heads) ** -0.5, ws,
                    self.gelu_exact)
                return out.reshape(B, T, L, C)

        # roll-free SW-MSA: the fused attention kernel shifts in VMEM and
        # the image-aware epilogue reads the inverse shift back, so neither
        # cyclic roll is materialized in HBM (the 4-row-misaligned XLA
        # slice+concat fusions measured ~7 ms/forward at serving batch)
        shift_in_kernel = (
            ss > 0 and _is_tpu_backend()
            and resolve_attn_impl(self.attn_impl, C, self.dim,
                                  self.dtype) == "pallas_full")

        if shift_in_kernel:
            xi = x.reshape(B, T, H, W, C)
            attn_s = WindowAttention(
                self.dim, (ws, ws), self.num_heads, attn_impl=self.attn_impl,
                dtype=self.dtype, name="attn",
            )(xi, mask, shift=ss)  # output in SHIFTED layout
            from stswincl_tpu.ops.pallas_add_ln_mlp import (
                fused_swin_block_epilogue_shifted)
            s2, b2 = _NormParams(self.dim, name="norm2")()
            s1, b1 = _NormParams(self.dim, name="norm1")()
            w1, bw1, w2, bw2 = _MlpParams(
                self.dim, int(self.dim * self.mlp_ratio), name="mlp")()
            sc = shortcut.astype(self.dtype).reshape(B, T, H, W, C)
            if out_frame is not None:
                # the frame axis is orthogonal to the spatial shift, so the
                # dead frame is dropped BEFORE the epilogue pays for it
                sc = sc[:, out_frame:out_frame + 1]
                attn_s = attn_s[:, out_frame:out_frame + 1]
            out = fused_swin_block_epilogue_shifted(
                sc, attn_s,
                s2, b2, w1, bw1, w2, bw2, s1, b1, ss, ws, self.gelu_exact)
            return out.reshape(B, -1, L, C)

        xi = x.reshape(B * T, H, W, C)
        xi = cyclic_shift(xi, ss)
        xi = xi.reshape(B, T, H, W, C)

        attn = WindowAttention(
            self.dim, (ws, ws), self.num_heads, attn_impl=self.attn_impl,
            dtype=self.dtype, name="attn",
        )(xi, mask)

        xo = attn.reshape(B * T, H, W, C)
        xo = cyclic_shift(xo, ss, reverse=True)
        xo = xo.reshape(B, T, L, C)
        if out_frame is not None:
            shortcut = shortcut[:, out_frame:out_frame + 1]
            xo = xo[:, out_frame:out_frame + 1]

        # --- reference's nonstandard residual/norm order (`:234-235`) ---
        # On TPU the whole post-attention tail is ONE kernel:
        # LN1(sum + mlp(LN2(sum))) with sum = shortcut + attn kept in fp32
        # VMEM (pallas_add_ln_mlp.fused_swin_block_epilogue). Neither the
        # residual sum, the normalized mlp input, nor the mlp output ever
        # exist in HBM — Pallas elementwise passes measured ~220 GB/s (vs
        # ~457 for XLA fusions), so minimizing PASSES dominates every other
        # elementwise consideration. Off-TPU keeps the flax path.
        from stswincl_tpu.ops.pallas_attention import _is_tpu_backend
        if _is_tpu_backend():
            from stswincl_tpu.ops.pallas_add_ln_mlp import (
                fused_swin_block_epilogue)
            s2, b2 = _NormParams(self.dim, name="norm2")()
            s1, b1 = _NormParams(self.dim, name="norm1")()
            w1, bw1, w2, bw2 = _MlpParams(
                self.dim, int(self.dim * self.mlp_ratio), name="mlp")()
            return fused_swin_block_epilogue(
                shortcut.astype(self.dtype), xo.astype(self.dtype), s2, b2,
                w1, bw1, w2, bw2, s1, b1, self.gelu_exact)
        x = shortcut + xo  # no pre-norm on the attention branch
        mlp_in = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        mlp_out = Mlp(int(self.dim * self.mlp_ratio), self.dim,
                      gelu_exact=self.gelu_exact, dtype=self.dtype,
                      name="mlp")(mlp_in)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + mlp_out)
        return x


class PatchMerging(nn.Module):
    """2x2 space-to-depth + LayerNorm + Linear(4C -> 2C, no bias), per frame
    (`swin_512.py:239-277`)."""

    input_resolution: Tuple[int, int]
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        H, W = self.input_resolution
        B, T, L, C = x.shape
        assert L == H * W and H % 2 == 0 and W % 2 == 0

        xi = x.reshape(B * T, H, W, C)

        # TPU: one Pallas kernel for the whole op — the XLA lowering of the
        # flax path below materializes a full-res fp32 LayerNorm output at
        # 4C channels plus a layout copy of it (2.6 ms/batch of the bs=8
        # clip trace vs a ~1.1 ms roofline; see ops/pallas_patch_merge.py)
        from stswincl_tpu.ops.pallas_patch_merge import (
            fused_patch_merge, patch_merge_applicable)
        if patch_merge_applicable(xi):
            scale, bias = _NormParams(4 * C, name="norm")()
            w = _KernelParam(4 * C, 2 * C, name="reduction")()
            out = fused_patch_merge(xi.astype(self.dtype), scale, bias, w)
            return out.reshape(B, T, L // 4, 2 * C)

        x0 = xi[:, 0::2, 0::2, :]
        x1 = xi[:, 1::2, 0::2, :]
        x2 = xi[:, 0::2, 1::2, :]
        x3 = xi[:, 1::2, 1::2, :]
        xc = jnp.concatenate([x0, x1, x2, x3], axis=-1)  # (B*T, H/2, W/2, 4C)
        xc = xc.reshape(B * T, L // 4, 4 * C)
        xc = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(xc)
        xc = nn.Dense(2 * C, use_bias=False,
                      kernel_init=torch_dense_kernel_init,
                      dtype=self.dtype, name="reduction")(xc)
        return xc.reshape(B, T, L // 4, 2 * C)


# temporal pair schedule: (start, stop) frame groups per layer (`:287`)
PAIR_SCHEDULE = (((0, 2), (2, 4)), ((1, 3),), ((0, 2), (2, 4)))


def _apply_paired(block_pair, x, pairs, out_frame=None, g0_out_frame=None):
    """Apply a (W-MSA, SW-MSA) block pair under the temporal group schedule.

    x: (B, 4, L, C). For the two-group schedule both groups are folded into
    the batch axis and run in ONE attention call; for the middle [1:3] group
    the outer frames pass through untouched (reference `x_y = x_v.clone()`
    pass-through, `swin_512.py:302-307`).

    out_frame (eval dead-compute skip, see `SwinTemporalStack`): only this
    group-frame index of the pair's output is consumed downstream — the
    FINAL (SW) block's epilogue runs on that frame alone, and the dead
    slots of the returned clip carry pass-through filler (never read).
    Only meaningful for the single-group schedules.
    """
    B, T, L, C = x.shape
    # out_frame rides POSITIONALLY so `nn.remat(..., static_argnums=(2,))`
    # sees it as static (a traced int cannot be a slice bound)
    if pairs == ((0, 2), (2, 4)):
        if g0_out_frame is not None:
            # dead-compute split (stage-2 layer 0 under `final_pair_only`,
            # see `SwinTemporalStack`): the (0, 2) group's frame-0 OUTPUT
            # is read by nothing downstream — the groups run as separate
            # calls so the first group's final (SW) epilogue covers only
            # its live frame; slot 0 of the return carries pass-through
            # filler (never read). Same math per group as the batch fold.
            g01 = block_pair[0](x[:, 0:2], None)
            g01 = block_pair[1](g01, g0_out_frame)
            g23 = block_pair[0](x[:, 2:4], None)
            g23 = block_pair[1](g23, None)
            return jnp.concatenate([x[:, 0:1], g01, g23], axis=1)
        xr = x.reshape(B * 2, 2, L, C)
        for blk in block_pair:
            xr = blk(xr, None)
        return xr.reshape(B, T, L, C)
    elif pairs == ((1, 3),):
        mid = x[:, 1:3]
        mid = block_pair[0](mid, None)
        mid = block_pair[1](mid, out_frame)
        if out_frame is not None:
            assert out_frame == 1  # frame 2 feeds the next layer's group
            return jnp.concatenate(
                [x[:, 0:2], mid, x[:, 3:4]], axis=1)  # x[:,1:2] slot is dead
        return jnp.concatenate([x[:, 0:1], mid, x[:, 3:4]], axis=1)
    elif pairs == ((2, 4),):
        # final-layer dead-compute skip (`final_pair_only`): only the (2, 4)
        # group's output can reach any consumer; frames 0-1 pass through
        tail = x[:, 2:4]
        tail = block_pair[0](tail, None)
        tail = block_pair[1](tail, out_frame)
        if out_frame is not None:
            assert out_frame == 1  # only frame -1 feeds the heads
            return jnp.concatenate(
                [x[:, 0:3], tail], axis=1)  # x[:,2:3] slot is dead
        return jnp.concatenate([x[:, 0:2], tail], axis=1)
    else:  # pragma: no cover - schedule is static
        raise ValueError(f"unsupported pair schedule {pairs}")


class SwinTemporalStack(nn.Module):
    """The full STswin module (`SwinTransformerLayerv5`, `swin_512.py:
    280-327`): 3 paired layers at (H/8, W/8) with window 8 / shift 4, patch
    merging, 3 paired layers at (H/16, W/16) with window 4 / shift 2.

    Input  (B, 4, H8, W8, C) NHWC feature clip (C = 512 nominally).
    Output (stage-1 (B, 4, H8, W8, C), stage-2 (B, 4, H8/2, W8/2, 2C)).
    """

    dim: int = 512
    input_resolution: Tuple[int, int] = (64, 80)
    num_heads: int = 4
    attn_impl: str = "auto"
    gelu_exact: bool = True
    remat: bool = False  # rematerialize each block in the backward pass
    # dead-compute skip for the stage-2 tail: every shipped consumer
    # (TswinPlus heads, contrast projector, streaming head) reads only the
    # last frame of stage2, whose value depends solely on the (2, 4) group
    # of the final layer — the reference computes the dead half anyway
    # (`swin_512.py:325-327` feeding `base18.py:92-96`). The final layer
    # therefore runs only that group, and the final + penultimate layers
    # run their SW epilogues only on the frames that still feed frame -1
    # (see `_apply_paired(out_frame=...)`). Frame-3 output is unchanged;
    # stage2 frames 0-2 are then NOT the reference values, so full-tensor
    # parity tests keep this False.
    final_pair_only: bool = False
    # layers per stage. (3, 3) is the reference architecture; smaller values
    # (compile-light test/dryrun configs) keep the alternating temporal
    # schedule — layer i uses PAIR_SCHEDULE[i % 2], so (2, 2) still
    # exercises both schedule variants once per stage.
    depths: Tuple[int, int] = (3, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, layer0_cached=None, layer0_only: bool = False):
        """Full stack: x (B, 4, H, W, C) -> (stage1, stage2).

        Streaming modes (used by `pipelines.streaming.StreamingSegmenter`):

        * ``layer0_only=True``: x is ONE temporal group (B, 2, H, W, C);
          applies just the first layer pair and returns its (B, 2, H, W, C)
          output. Layer 0's group computation has no absolute-position
          input (relative bias is within-window; LN/MLP are per-row), so
          the result for a frame pair is clip-position-independent — the
          streaming cache seed.
        * ``layer0_cached``: (B, 2, H, W, C) layer-0 output for frames
          (0, 1), computed two steps earlier when that pair sat at
          positions (2, 3). Layer 0 then runs only on the new (2, 4)
          group, and the call returns (stage1, stage2, g_new) where g_new
          is the fresh group output to cache. Bit-identical to the full
          forward: the cached tensor IS the same computation.
        """
        B, T, H, W, C = x.shape
        assert (H, W) == tuple(self.input_resolution), (
            f"resolution mismatch: {(H, W)} vs {self.input_resolution}"
        )
        res2 = (H // 2, W // 2)

        x = x.reshape(B, T, H * W, C)

        # jax.checkpoint per block: trades recompute for activation memory —
        # the TPU equivalent of torch checkpointing the swin layers
        # static_argnums=(2,): `out_frame` (arg 2 counting self) is a Python
        # int/None consumed by slice bounds — it must stay static under the
        # checkpoint wrapper
        block_cls = (nn.remat(SpaceTimeSwinBlock, static_argnums=(2,))
                     if self.remat else SpaceTimeSwinBlock)

        def stage1_pair(i):
            return (
                block_cls(
                    self.dim, (H, W), self.num_heads, window_size=8,
                    shift_size=0, attn_impl=self.attn_impl,
                    gelu_exact=self.gelu_exact, dtype=self.dtype,
                    name=f"layers_{i}_w"),
                block_cls(
                    self.dim, (H, W), self.num_heads, window_size=8,
                    shift_size=4, attn_impl=self.attn_impl,
                    gelu_exact=self.gelu_exact, dtype=self.dtype,
                    name=f"layers_{i}_sw"),
            )

        def stage2_pair(i):
            return (
                block_cls(
                    self.dim * 2, res2, self.num_heads, window_size=4,
                    shift_size=0, attn_impl=self.attn_impl,
                    gelu_exact=self.gelu_exact, dtype=self.dtype,
                    name=f"layers_{i}_w"),
                block_cls(
                    self.dim * 2, res2, self.num_heads, window_size=4,
                    shift_size=2, attn_impl=self.attn_impl,
                    gelu_exact=self.gelu_exact, dtype=self.dtype,
                    name=f"layers_{i}_sw"),
            )

        if layer0_only:
            assert T == 2, "layer0_only expects one (B, 2, H, W, C) group"
            for blk in stage1_pair(0):
                x = blk(x, None)
            return x.reshape(B, 2, H, W, C)

        assert T == 4, "temporal stack expects clips of 4 frames"
        d1, d2 = self.depths
        g_new = None
        for i in range(d1):
            if i == 0 and layer0_cached is not None:
                # streaming: frames (0, 1) ride the cache; only the new
                # (2, 4) group is computed (half of layer 0)
                g = x[:, 2:4]
                for blk in stage1_pair(0):
                    g = blk(g, None)
                g_new = g.reshape(B, 2, H, W, C)
                x = jnp.concatenate(
                    [layer0_cached.reshape(B, 2, H * W, C), g], axis=1)
            else:
                x = _apply_paired(stage1_pair(i), x, PAIR_SCHEDULE[i % 2])
        stage1 = x.reshape(B, T, H, W, C)

        x = PatchMerging((H, W), self.dim, dtype=self.dtype, name="downsample")(x)
        for i in range(d2):
            pairs = PAIR_SCHEDULE[i % 2]
            of = None
            g0of = None
            # the dead-group skip only applies when the final layer runs the
            # two-group schedule (its (0, 2) half never reaches frame -1)
            if self.final_pair_only and i == d2 - 1 and len(pairs) == 2:
                pairs = ((2, 4),)
                of = 1  # of the kept group only frame -1 feeds the heads
            elif (self.final_pair_only and i == d2 - 2
                  and pairs == ((1, 3),) and (d2 - 1) % 2 == 0):
                # penultimate stage-2 layer computes frames (1, 2); the
                # final layer's (2, 4) group reads only frame 2, and the
                # heads read only frame -1 of stage2 — so its frame-1
                # output is dead too
                of = 1
            elif self.final_pair_only and i == 0 and d2 == 3:
                # layer-0 frame-0 output is read by NOTHING at this depth:
                # layer 1 is the (1, 3) middle group, layer 2 keeps only
                # the (2, 4) group, and the heads read frame -1 — the
                # (0, 2) group's SW epilogue runs on frame 1 alone
                g0of = 1
            x = _apply_paired(stage2_pair(i + d1), x, pairs, out_frame=of,
                              g0_out_frame=g0of)
        stage2 = x.reshape(B, T, H // 2, W // 2, 2 * C)
        if layer0_cached is not None:
            return stage1, stage2, g_new
        return stage1, stage2
