"""Device A/B of maxpool 3x3/s2/p1 formulations at the stem-output shape
(32, 256, 320, 64) bf16 — the r5 trace's fusion.21 runs at ~3x memory
roofline (1.26 ms/batch vs ~0.5).

Variants:
  a) reduce_window (flax nn.max_pool — current default),
  b) separable: two 1-D reduce_windows (H then W),
  c) slice-max: pairwise max over strided slices, no reduce_window —
     out[r] = max(x[2r-1], x[2r], x[2r+1]) built from stride-2 slices
     (post-ReLU inputs are >= 0, so the pad-edge contributes nothing,
     matching reduce_window's -inf init).

All are measured inside one jit with a realistic producer (relu) so XLA
can pick layouts as it would in the model; parity asserted vs (a).
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
import flax.linen as nn


def pool_reduce_window(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def pool_separable(x):
    x = nn.max_pool(x, (3, 1), strides=(2, 1), padding=((1, 1), (0, 0)))
    return nn.max_pool(x, (1, 3), strides=(1, 2), padding=((0, 0), (1, 1)))


def _slicemax_1d(x, axis):
    """max over 3-window stride 2 pad 1 along `axis` for non-negative x."""
    n = x.shape[axis]
    sl = lambda a, b, s: jax.lax.slice_in_dim(x, a, b, stride=s, axis=axis)
    center = sl(0, n, 2)           # x[2r]
    right = sl(1, n, 2)            # x[2r+1]
    m = jnp.maximum(center, right)
    # x[2r-1] = right shifted down one output row; row 0's window top is the
    # pad (contributes nothing: inputs >= 0 after ReLU)
    left = sl(1, n - 2, 2)         # x[2r+1] for r in [0, n/2-1)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    left = jnp.pad(left, pad)
    return jnp.maximum(m, left)


def pool_slicemax(x):
    return _slicemax_1d(_slicemax_1d(x, 1), 2)


def timeit_scan(pool, x, reps=60):
    """Chained-scan timing (single dispatch; block_until_ready is not
    reliable through the axon tunnel — same discipline as bench.py)."""
    @jax.jit
    def run(x):
        def body(carry, _):
            out = pool(nn.relu(x.astype(jnp.bfloat16) + carry * 1e-12))
            return jnp.sum(out).astype(jnp.float32), ()
        final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return final

    float(run(x))  # compile + settle
    t0 = time.perf_counter()
    r = float(run(x))
    dt = (time.perf_counter() - t0) / reps * 1000
    return dt, r


def main():
    N, H, W, C = 32, 256, 320, 64
    rng = np.random.default_rng(0)
    pre = jnp.asarray(rng.normal(0, 1, (N, H, W, C)).astype(np.float32))

    variants = {"reduce_window": pool_reduce_window,
                "separable": pool_separable,
                "slicemax": pool_slicemax}
    results = {}
    for name, pool in variants.items():
        ms, checksum = timeit_scan(pool, pre)
        results[name] = checksum
        print(f"{name:14s} {ms:7.3f} ms   checksum {checksum:.6e}",
              flush=True)
    ref = results["reduce_window"]
    for name, cs in results.items():
        assert abs(cs - ref) <= abs(ref) * 1e-3, (name, cs, ref)


if __name__ == "__main__":
    main()
