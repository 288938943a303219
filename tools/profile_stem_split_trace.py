"""Per-op trace of the split-parity stem candidate (see
profile_stem_split.py) to find where its time goes."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from stswincl_tpu.ops.stem_s2d import stem_s2d_conv_split


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "split"
    N, H, W = 32, 512, 640
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, H, W, 3), dtype=np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (7, 7, 3, 64)).astype(np.float32))
    dt = jnp.bfloat16

    @jax.jit
    def split(x, w):
        return stem_s2d_conv_split(x.astype(dt), w, dt)

    @jax.jit
    def direct(x, w):
        return jax.lax.conv_general_dilated(
            x.astype(dt), w.astype(dt), window_strides=(2, 2),
            padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(dt)

    fn = {"split": split, "direct": direct}[which]
    fn(x, w).block_until_ready()
    trace_dir = f"/tmp/stem_{which}_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(8):
            out = fn(x, w)
        out.block_until_ready()
    from trace_report import report
    report(trace_dir, top_n=20, merge=True)


if __name__ == "__main__":
    main()
