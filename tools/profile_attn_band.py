"""A/B the fused attention kernel's band_rows knob on device.

Round-3 trace: attention kernels 19.8 ms/batch at ~51% effective MFU on
the bs=8 clip path — the largest residual vs the ~110 fps roofline
(README "Where the remaining time goes"). band_rows>1 processes several
window rows per grid cell: qkv/proj matmuls get band_rows-x bigger M and
per-cell fixed costs amortize; numerics are band-independent
(tests/test_pallas_block_attention.py::test_full_fused_band_rows_matches_single_row).

Run on the TPU:  python tools/profile_attn_band.py
Prints ms/call for band_rows in {1, 2, 4} at the stage-1 and stage-2
bs=8 serving shapes, W-MSA and shift-in-kernel SW-MSA.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from stswincl_tpu.ops.pallas_block_attention import (
    fused_swin_block_attention)
from stswincl_tpu.ops.window import (
    relative_position_index, shifted_window_attention_mask)

N = 16


def _chain(fn, *args):
    @jax.jit
    def run(*args):
        def body(carry, _):
            out = fn(args[0] + carry, *args[1:])
            return jnp.sum(out).astype(jnp.float32) * 1e-12, ()

        final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N)
        return final

    float(run(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N


def stage(tag, B, T, H, W, C, heads, ws, shift):
    rng = np.random.default_rng(0)
    hd = C // heads
    N_win = ws * ws
    TN = T * N_win
    x = jnp.asarray(rng.standard_normal(
        (B, T, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)).astype(np.float32) * .02)
    bqkv = jnp.zeros(3 * C, jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((C, C)).astype(np.float32) * .02)
    bproj = jnp.zeros(C, jnp.float32)
    table = rng.standard_normal(((2 * ws - 1) ** 2, heads)).astype(np.float32)
    idx = relative_position_index(ws, ws)
    bias = table[idx.reshape(-1)].reshape(N_win, N_win, heads).transpose(2, 0, 1)
    bias_tiled = jnp.asarray(np.tile(bias, (1, T, T)))
    if shift:
        m = shifted_window_attention_mask(H, W, ws, shift)
        mask_tiled = jnp.asarray(np.tile(m, (1, T, T)))
    else:
        mask_tiled = jnp.zeros((1, TN, TN), jnp.float32)
    scale = hd ** -0.5

    for br in (1, 2, 4):
        if (H // ws) % br:
            continue

        def fn(x, br=br):
            return fused_swin_block_attention(
                x, wqkv, bqkv, wproj, bproj, bias_tiled, mask_tiled,
                heads, scale, ws, shift, False, br)

        try:
            dt = _chain(fn, x)
            print(f"{tag} band_rows={br}: {dt * 1e3:.3f} ms/call", flush=True)
        except Exception as e:
            print(f"{tag} band_rows={br}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    # the model runs num_heads=4 at BOTH stages (TswinPlus default — the
    # r4 version of this tool measured 16/32-head shapes the model never
    # runs). Folded batch: clip path bs=8 -> two-group stage-1 cells see
    # B=16; serving bs=16 -> B=32; single-group cells half that.
    for B in (16, 32):
        stage(f"B={B:<2} stage1 W-MSA ", B, 2, 64, 80, 512, 4, 8, 0)
        stage(f"B={B:<2} stage1 SW-MSA", B, 2, 64, 80, 512, 4, 8, 4)
        stage(f"B={B:<2} stage2 W-MSA ", B, 2, 32, 40, 1024, 4, 4, 0)
        stage(f"B={B:<2} stage2 SW-MSA", B, 2, 32, 40, 1024, 4, 4, 2)
