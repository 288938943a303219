"""Capture a device trace of the bs=8 clip-path forward (the exact
`bench.py` computation: TswinPlus forward + composed upsample/argmax) and
print the per-op device-time report via tools/trace_report.py.

Usage: python tools/profile_clip_trace.py [trace_dir] [reps]

This is the measurement behind README's per-kernel MFU table (VERDICT r4
task 1: account for the clip-path residual kernel by kernel).
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


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/clip_trace"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from stswincl_tpu.models import TswinPlus
    from stswincl_tpu.ops.resize import composed_upsample_argmax_cf

    B, H, W, OH, OW = 8, 512, 640, 1024, 1280
    model = TswinPlus(num_classes=12, dtype=jnp.bfloat16)
    x_small = jnp.zeros((1, 4, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x_small, train=False)

    @jax.jit
    def one_frame(variables, clip):
        lcf = model.apply(variables, clip, train=False, head_res_logits=True)
        return composed_upsample_argmax_cf(lcf, (H, W), (OH, OW),
                                           align_out=True)

    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.random((B, 4, H, W, 3), dtype=np.float32))
    one_frame(variables, clip).block_until_ready()  # compile

    t0 = time.perf_counter()
    for _ in range(4):
        out = one_frame(variables, clip)
    out.block_until_ready()
    print(f"pre-trace: {(time.perf_counter()-t0)/4*1000:.2f} ms/batch",
          file=sys.stderr)

    with jax.profiler.trace(trace_dir):
        for _ in range(reps):
            out = one_frame(variables, clip)
        out.block_until_ready()

    from trace_report import report
    report(trace_dir, top_n=60, merge=True)
    print(f"\n(times above are summed over {reps} reps of the bs={B} batch; "
          f"divide by {reps} for per-batch ms)")


if __name__ == "__main__":
    main()
