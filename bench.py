"""Benchmark: EndoVis18-protocol inference throughput on one TPU chip.

Reproduces the reference latency protocol (`seg18/test.py:152-160`): bs=1,
t=4 clip at 512x640, forward + bilinear align-corners upsample to 1024x1280
+ argmax — as ONE jitted XLA program in bf16.

Measurement notes:
  * parameters are initialized at a small spatial size (the param tree is
    resolution-independent) to avoid paying a second full-size compile for
    init;
  * throughput is measured by enqueuing a window of DISTINCT pre-staged
    inputs and blocking on every output (single-call block_until_ready
    timing is unreliable through the remote-execution tunnel); best of 3
    windows is reported.

`vs_baseline`: the reference publishes no GPU number (BASELINE.md); the
recorded ratio is against a conservative 20 fps PyTorch-GPU estimate for
this ~1.8 TFLOP/clip model, pending a measured reference value.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax

# persistent compilation cache: compiles through the TPU tunnel are slow
# (minutes); cache hits make repeat runs near-instant
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

PYTORCH_GPU_FPS_ESTIMATE = 20.0


def main():
    from stswincl_tpu.models import TswinPlus
    from stswincl_tpu.train import make_seg_eval_step

    model = TswinPlus(num_classes=12, dtype=jnp.bfloat16)
    # init at small spatial size: same param tree, far cheaper compile
    x_small = jnp.zeros((1, 4, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x_small, train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})

    eval_step = make_seg_eval_step(model, out_hw=(1024, 1280))

    rng = np.random.default_rng(0)
    n_inputs = 16
    clips = [jnp.asarray(rng.random((1, 4, 512, 640, 3), dtype=np.float32))
             for _ in range(n_inputs)]
    jax.block_until_ready(clips)

    # compile + warmup
    jax.block_until_ready(eval_step(params, stats, clips[0]))

    best_fps = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [eval_step(params, stats, c) for c in clips]
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        best_fps = max(best_fps, n_inputs / dt)

    print(json.dumps({
        "metric": "endovis18_infer_fps_512x640_bs1",
        "value": round(best_fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(best_fps / PYTORCH_GPU_FPS_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
