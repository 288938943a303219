"""End-to-end serving-band A/B: StreamingSegmenter steady-state fps at
bs=16 under STSWIN_ATTN_BAND_ROWS in {1, 2} (the bench's exact protocol).

Per-kernel band deltas measure within ~1% noise (tools/profile_attn_band);
this end-to-end number is what decides the shipped default.
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

B = 16
N = 32
H, W, OH, OW = 512, 640, 1024, 1280


def main():
    from stswincl_tpu.models import TswinPlus
    from stswincl_tpu.pipelines.streaming import StreamingSegmenter

    model = TswinPlus(num_classes=12, dtype=jnp.bfloat16)
    x_small = jnp.zeros((1, 4, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x_small, train=False)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((B, H, W, 3), dtype=np.float32))
    clip = jnp.asarray(rng.random((B, 4, H, W, 3), dtype=np.float32))

    for band in ("1", "2"):
        os.environ["STSWIN_ATTN_BAND_ROWS"] = band
        seg = StreamingSegmenter(model, variables, out_hw=(OH, OW))
        cache = seg.init_cache(clip)

        @jax.jit
        def stream_chain(bb_vars, head_vars, cache, frame):
            def body(carry, _):
                c, checksum = carry
                c, pred = seg._step_fn(bb_vars, head_vars, c,
                                       frame + checksum * 1e-12)
                return (c, jnp.sum(pred).astype(jnp.float32)), ()

            (c, s), _ = jax.lax.scan(
                body, (cache, jnp.float32(0.0)), None, length=N)
            return s

        args = (seg._bb_vars, seg._head_vars, cache, frames)
        float(stream_chain(*args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(stream_chain(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"serving bs={B} band_rows={band}: "
              f"{B * N / best:.2f} frames/sec/chip", flush=True)


if __name__ == "__main__":
    main()
