"""Fused 3x3 (dilated) conv + folded-BN + residual + ReLU Pallas kernel.

**Benchmark artifact — NOT routed into any model path.** Written to attack
the ResNet18-OS8 dilated stages (layer4 d=2, layer5 d=4, the reference's
custom stages `seg18/net/Ours/resnet.py:120-122`, ~90% of backbone FLOPs)
after per-stage isolation showed them at 31%/58% MFU. The measured outcome
(tools/profile_conv_kernel.py, v5e) is a NEGATIVE result kept for the
record:

  * at serving batch (B=32 frames) XLA's own conv lowering reaches
    **77.7% MFU** on the 512->512 d=4 shape — this kernel reaches 43.6%:
    the row-band halo (x2 at TH=8) times the three column-tap copies (x3)
    amplify input DMA reads ~6x, and VMEM cannot hold wider bands
    alongside the resident 4.7MB weights;
  * at B=4 (bs=1 clips) both run at the same speed, bound by per-call
    overheads, and in-model XLA fuses the back-to-back stage convs far
    better than either isolated call.

Conclusion: XLA's conv path is already near the practical roofline where
it matters; the kernel stays as a tested reference point for future conv
work (e.g. a weight-streaming variant that could afford TH=32 bands).

Design notes (what it does): NHWC, stride 1, torch symmetric padding
(pad == dilation). The input is pre-padded and its three column taps
pre-sliced in XLA (Mosaic rejects non-tile-aligned slices along the
sublane W axis even on HBM memrefs, and sublane rotates are 32-bit-only,
so kx*d column shifts cannot be done in-kernel on bf16); the kernel tiles
(batch, row-band) grid cells, double-buffering the halo-extended bands
HBM->VMEM with manual DMA while weights ride a constant-index BlockSpec
(fetched once, VMEM-resident), accumulating the 9 taps as MXU matmuls in
fp32 scratch with the BN affine / residual / ReLU epilogue fused.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 13 * 1024 * 1024  # leave headroom below the 16MB/core VMEM


def _pick_tile_rows(H: int, W: int, d: int, cin: int, cout: int,
                    itemsize: int = 2) -> Optional[int]:
    """Largest row-band TH (divisor of H) whose working set fits VMEM."""
    if W % 16:
        # the W axis is the sublane dim inside the kernel: the
        # (TH, W, C) -> (TH*W, C) free reshape needs W % tile == 0
        # (16 covers bf16's packed tiling; 8 would do for fp32)
        return None
    best = None
    for th in (32, 16, 8, 4):
        if H % th:
            continue
        # 2 slots x 3 column-tap bands of (th+2d, W, cin)
        xt = 2 * 3 * (th + 2 * d) * W * cin * itemsize
        wts = 9 * cin * cout * itemsize
        acc = th * W * cout * 4
        out = 2 * th * W * cout * itemsize      # pipeline double buffer
        res = 2 * th * W * cout * itemsize
        if xt + wts + acc + out + res < _VMEM_BUDGET:
            best = th
            break
    return best


def _conv_kernel(x_hbm, w_ref, scale_ref, shift_ref, res_ref, out_ref,
                 xt_ref, acc_ref, sem_ref, *, TH, W, d, relu, with_res):
    n = pl.program_id(0)
    i = pl.program_id(1)
    n_rows = pl.num_programs(1)

    halo = TH + 2 * d

    # Column taps: slices along the (sublane-tiled) W axis must be
    # tile-aligned — kx*d generally is not, and Mosaic enforces this even
    # on HBM memrefs. The caller therefore pre-slices the three column-tap
    # views in XLA (x_hbm is (N, 3, H+2d, W, C)); every slice below then
    # touches only untiled leading axes.
    def band_dma(slot, kx, band_n, band_i):
        return pltpu.make_async_copy(
            x_hbm.at[band_n, kx, pl.ds(band_i * TH, halo)],
            xt_ref.at[slot, kx],
            sem_ref.at[slot, kx],
        )

    step = n * n_rows + i
    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    # warm-up: the very first grid step fetches its own bands
    @pl.when(step == 0)
    def _():
        for kx in range(3):
            band_dma(0, kx, 0, 0).start()

    # prefetch the next tile's bands while computing this one
    @pl.when(step + 1 < pl.num_programs(0) * n_rows)
    def _():
        nn = jax.lax.div(step + 1, n_rows)
        ni = jax.lax.rem(step + 1, n_rows)
        for kx in range(3):
            band_dma(nxt, kx, nn, ni).start()

    for kx in range(3):
        band_dma(slot, kx, n, i).wait()

    cin = x_hbm.shape[-1]
    cout = out_ref.shape[-1]

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for kx in range(3):
        for ky in range(3):
            sub = xt_ref[slot, kx, ky * d: ky * d + TH]  # (TH, W, Cin)
            acc_ref[:] += jnp.dot(
                sub.reshape(TH * W, cin), w_ref[ky, kx],
                preferred_element_type=jnp.float32)

    y = acc_ref[:] * scale_ref[0] + shift_ref[0]
    y = y.reshape(TH, W, cout)
    if with_res:
        y = y + res_ref[0].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)


def conv3x3_bn_act(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    *,
    dilation: int = 1,
    relu: bool = True,
    residual: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = [relu]( conv3x3_d(x, w) * scale + shift [+ residual] ).

    x: (N, H, W, Cin); w: (3, 3, Cin, Cout) HWIO; scale/shift: (Cout,) fp32
    (inference-folded BN); residual: optional (N, H, W, Cout).
    Returns (N, H, W, Cout) in x.dtype. Falls back to None-return when the
    shape does not fit the kernel's envelope — caller must check with
    `supports()`.
    """
    N, H, W, cin = x.shape
    cout = w.shape[-1]
    d = dilation
    TH = _pick_tile_rows(H, W, d, cin, cout, jnp.dtype(x.dtype).itemsize)
    assert TH is not None, "caller must gate on supports()"

    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    # pre-slice the three column taps (see the kernel's alignment note)
    xp = jnp.stack([xp[:, :, k * d: k * d + W, :] for k in range(3)], axis=1)
    w = w.astype(x.dtype)
    scale = scale.astype(jnp.float32).reshape(1, 1, cout)
    shift = shift.astype(jnp.float32).reshape(1, 1, cout)
    if residual is None:
        res = jnp.zeros((N, 1, 1, cout), x.dtype)  # placeholder, unread
        res_spec = pl.BlockSpec((1, 1, 1, cout), lambda n, i: (n, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        res = residual
        res_spec = pl.BlockSpec((1, TH, W, cout), lambda n, i: (n, i, 0, 0),
                                memory_space=pltpu.VMEM)

    grid = (N, H // TH)
    kernel = functools.partial(
        _conv_kernel, TH=TH, W=W, d=d, relu=relu,
        with_res=residual is not None)

    flops = 2 * N * H * W * cin * cout * 9
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # explicitly HBM: with pl.ANY the compiler may place the array
            # in VMEM, whose refs are tile-constrained — the kx*d column
            # offsets of the band DMAs are only legal from untiled HBM
            pl.BlockSpec(memory_space=pltpu.HBM),          # padded x
            pl.BlockSpec((3, 3, cin, cout), lambda n, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),          # weights resident
            pl.BlockSpec((1, 1, cout), lambda n, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cout), lambda n, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            res_spec,
        ],
        out_specs=pl.BlockSpec((1, TH, W, cout), lambda n, i: (n, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, TH + 2 * d, W, cin), x.dtype),
            pltpu.VMEM((TH * W, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(xp.size + res.size + N * H * W * cout) *
            jnp.dtype(x.dtype).itemsize + 9 * cin * cout * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 2 * 1024 * 1024),
        interpret=interpret,
    )(xp, w, scale, shift, res)


def supports(x_shape, w_shape, dilation: int, stride: int,
             itemsize: int = 2) -> bool:
    """Envelope check: stride-1 3x3, lane-aligned channels, VMEM fit."""
    N, H, W, cin = x_shape
    kh, kw, _, cout = w_shape
    if (kh, kw) != (3, 3) or stride != 1:
        return False
    if cin % 128 or cout % 128:
        return False
    return _pick_tile_rows(H, W, dilation, cin, cout, itemsize) is not None


def fold_bn(gamma, beta, mean, var, eps: float = 1e-5):
    """Inference BN -> (scale, shift): y = x*scale + shift."""
    scale = gamma / jnp.sqrt(var + eps)
    return scale, beta - mean * scale
