"""Device A/B of the three stem-conv formulations at the bs=8 clip shape.

  a) direct 7x7/s2 XLA conv (current default; ~12% MFU, r5 trace 2.10
     ms/batch + a 0.48 ms input layout copy XLA inserts for it),
  b) packed space-to-depth (r5 NEGATIVE result: ~12 ms XLA transpose),
  c) split-parity space-to-depth (`stem_s2d_conv_split`): the W-parity
     fold is a free row-major view, only two stride-2 row slices move
     data, then two 4x4/s1 C_in=6 convs summed.

Each candidate is measured as a jitted fp32-input -> conv-output function
so every layout copy the formulation induces is inside the timing.
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

from stswincl_tpu.ops.stem_s2d import (stem_s2d_conv, stem_s2d_conv_split)


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    N, H, W = 32, 512, 640
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, H, W, 3), dtype=np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (7, 7, 3, 64)).astype(np.float32))
    dt = jnp.bfloat16

    @jax.jit
    def direct(x, w):
        xb = x.astype(dt)
        return jax.lax.conv_general_dilated(
            xb, w.astype(dt), window_strides=(2, 2),
            padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(dt)

    @jax.jit
    def packed(x, w):
        return stem_s2d_conv(x.astype(dt), w, dt)

    @jax.jit
    def split(x, w):
        return stem_s2d_conv_split(x.astype(dt), w, dt)

    a = np.asarray(direct(x, w), np.float32)
    c = np.asarray(split(x, w), np.float32)
    err = np.max(np.abs(a - c)) / max(1e-6, np.max(np.abs(a)))
    print(f"split vs direct rel err: {err:.2e}")

    for name, fn in [("direct", direct), ("packed", packed),
                     ("split", split)]:
        ms = timeit(fn, x, w)
        print(f"{name:8s} {ms:7.3f} ms/batch")


if __name__ == "__main__":
    main()
