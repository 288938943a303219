"""Device trace of the StreamingSegmenter serving step (bs=8).

The serving step is: ONE backbone pass on the new frame + the full
swin/head stack on the cached 4-frame features + composed resize+argmax.
This harness captures an xplane trace of the chained step; analyze with
`python tools/trace_report.py /tmp/stream_trace 40 --merge`.
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

B = 8
N = 16


def main():
    from stswincl_tpu.models import TswinPlus
    from stswincl_tpu.pipelines.streaming import StreamingSegmenter

    model = TswinPlus(num_classes=12, dtype=jnp.bfloat16)
    x_small = jnp.zeros((1, 4, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x_small, train=False)

    seg = StreamingSegmenter(model, variables, out_hw=(1024, 1280))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((B, 512, 640, 3), dtype=np.float32))
    clip0 = jnp.asarray(rng.random((B, 4, 512, 640, 3), dtype=np.float32))
    cache = seg.init_cache(clip0)

    step = seg._step_fn

    @jax.jit
    def chained(bb, hv, cache, frame):
        def body(carry, _):
            c, ck = carry
            c, pred = step(bb, hv, c, frame + ck * 1e-12)
            return (c, jnp.sum(pred).astype(jnp.float32)), ()

        (c, ck), _ = jax.lax.scan(body, (cache, jnp.float32(0.0)), None,
                                  length=N)
        return ck

    float(chained(seg._bb_vars, seg._head_vars, cache, frames))
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        float(chained(seg._bb_vars, seg._head_vars, cache, frames))
        best = min(best, time.perf_counter() - t0)
    print(f"serving step: {best / N * 1000:.2f} ms "
          f"({B * N / best:.1f} frames/sec/chip)", flush=True)

    with jax.profiler.trace("/tmp/stream_trace"):
        float(chained(seg._bb_vars, seg._head_vars, cache, frames))


if __name__ == "__main__":
    main()
