"""Benchmark: EndoVis18-protocol inference throughput on one TPU chip.

Reproduces the reference latency protocol (`seg18/test.py:152-160`): a t=4
clip at 512x640 in, forward + bilinear align-corners upsample to 1024x1280
+ argmax out, bf16 compute. Two protocol-faithful configurations are
measured and printed as JSON lines on stdout:

  1. clip path   — the reference's exact computation: every output frame
     re-runs the full 4-frame clip forward (bs=1 and the throughput-optimal
     serving batch are both measured; the JSON carries both).
  2. video serving (headline, printed LAST) — the `StreamingSegmenter`:
     consecutive clips share 3 of 4 frames, so the per-frame backbone
     features are cached and each new frame costs ONE backbone pass + the
     (frame-mixing, uncacheable) swin/head stack. Per-frame outputs are
     NUMERICS-IDENTICAL to the full-clip forward (tests/test_streaming.py
     asserts bit-equality of predictions), so this is the same protocol a
     serving deployment would run, not an approximation.

Measurement: the axon TPU tunnel makes single-dispatch wall-clock timing
unreliable (async dispatch returns early; host<->device copies ride a slow
relay that a production host doesn't have). So each number times N forwards
chained inside ONE jitted `lax.scan` whose carry depends on each step's
prediction — the device must execute all N sequentially — returning a
single scalar. Device throughput = N / wall_time.

`vs_baseline` grounding: the reference publishes NO speed number
(BASELINE.md), and no GPU exists in this environment to measure one, so the
denominator is a FLOP-grounded bracket rather than a bare guess:

  * the model is a measured ~1.84 TFLOP per clip forward
    (`tools/profile_components*.py`; ~1.73 after the dead-group skip — the
    reference performs the full 1.84 every output frame);
  * the reference protocol is fp32 (no autocast anywhere in
    `seg18/test.py`), bs=1, PyTorch 1.8 + cuDNN;
  * realistic reference hardware (V100-class, the PyTorch-1.8/TMI-2022 era):
    published mmseg Swin-T+UperNet numbers (236 GFLOP @ 512x512, ~20 fps
    V100 fp32) put comparable swin-hybrid seg nets at ~4.7 effective
    TFLOP/s, i.e. ~30% of V100 fp32 peak. At 1.84 TFLOP/frame that is
    ~2.6 fps  -> BASELINE_FPS_REALISTIC;
  * generous cap: 20 fps requires 36.8 effective TFLOP/s — an A100
    running TF32 at ~24% MFU, i.e. newer hardware + a faster math mode
    than the reference code ever requests. Kept as the conservative
    denominator so `vs_baseline` is an underestimate
    -> BASELINE_FPS_GENEROUS_CAP.

Every JSON line reports `vs_baseline` against the generous 20 fps cap and
`vs_baseline_bracket` = [value/20, value/2.6] so the claim is an argument,
not an assertion.

Metric names are stable across rounds (no batch size in the key; the batch
is a field). Round-1 reported bs=1 only; round-2's headline moved to the
batched serving number — both remain printed.
"""

import json
import sys
import time

import jax

# persistent compilation cache: compiles through the TPU tunnel are slow
# (minutes); cache hits make repeat runs near-instant
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

BASELINE_FPS_GENEROUS_CAP = 20.0   # A100-TF32-class upper bound (see doc)
BASELINE_FPS_REALISTIC = 2.6       # V100 fp32, FLOP-scaled from mmseg swin
N_CHAIN = 32


def _bracket(value):
    return {
        "vs_baseline": round(value / BASELINE_FPS_GENEROUS_CAP, 3),
        "vs_baseline_bracket": [
            round(value / BASELINE_FPS_GENEROUS_CAP, 3),
            round(value / BASELINE_FPS_REALISTIC, 3),
        ],
    }


def main():
    from stswincl_tpu.models import TswinPlus
    from stswincl_tpu.ops.resize import composed_upsample_argmax_cf

    model = TswinPlus(num_classes=12, dtype=jnp.bfloat16)
    # init at small spatial size: same param tree, far cheaper compile
    x_small = jnp.zeros((1, 4, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x_small, train=False)

    def one_frame(variables, clip):
        # protocol: model upsample to input res (base18.py:106) then eval
        # resize to 1024x1280 + argmax (seg18/test.py:152-160); the two
        # bilinear maps are composed into one fused resize+argmax kernel
        lcf = model.apply(variables, clip, train=False, head_res_logits=True)
        return composed_upsample_argmax_cf(lcf, (512, 640), (1024, 1280),
                                           align_out=True)

    @jax.jit
    def chained(variables, clip):
        def body(carry, _):
            # carry perturbs the input so no two steps are identical and
            # each step depends on the previous one (strict serialization)
            pred = one_frame(variables, clip + carry * 1e-12)
            checksum = jnp.sum(pred).astype(jnp.float32)
            return checksum, checksum

        final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N_CHAIN)
        return final

    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.random((1, 4, 512, 640, 3), dtype=np.float32))

    # compile + warmup
    float(chained(variables, clip))

    bs1_fps = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        float(chained(variables, clip))  # scalar D2H forces full execution
        dt = time.perf_counter() - t0
        bs1_fps = max(bs1_fps, N_CHAIN / dt)

    print(f"device-chained throughput bs=1: {bs1_fps:.2f} fps",
          file=sys.stderr)

    # clip path at the throughput-optimal serving batch — the per-chip
    # serving number BASELINE.json's ">5x frames/sec/chip" targets
    best_bs, best_fps = 1, bs1_fps
    for bs in (8, 16):
        try:
            clipb = jnp.asarray(
                rng.random((bs, 4, 512, 640, 3), dtype=np.float32))
            float(chained(variables, clipb))
            best = np.inf
            for _ in range(2):
                t0 = time.perf_counter()
                float(chained(variables, clipb))
                best = min(best, time.perf_counter() - t0)
            fps = bs * N_CHAIN / best
            print(f"device-chained throughput bs={bs}: "
                  f"{fps:.2f} frames/sec/chip", file=sys.stderr)
            if fps > best_fps:
                best_bs, best_fps = bs, fps
        except Exception as e:  # memory/compile limits must not kill the bench
            print(f"bs={bs} probe skipped: {e}", file=sys.stderr)

    clip_line = {
        "metric": "endovis18_infer_fps_512x640_per_chip",
        "value": round(best_fps, 3),
        "unit": "frames/sec/chip",
        "batch": best_bs,
        "bs1_fps": round(bs1_fps, 3),
        **_bracket(best_fps),
    }

    # video serving (headline): steady-state streaming — the backbone
    # feature cache makes each new frame cost ONE backbone pass; per-frame
    # predictions are numerics-identical to the full-clip forward
    # (tests/test_streaming.py), so this reproduces seg18/test.py outputs
    stream_line = None
    try:
        from stswincl_tpu.pipelines.streaming import StreamingSegmenter

        seg = StreamingSegmenter(model, variables, out_hw=(1024, 1280))
        stream_best_bs, stream_best_fps = None, None
        for bs in (8, 16):
            # everything per-bs sits inside the try: a bs=16 OOM during
            # cache warmup must not discard an already-measured bs=8 result
            try:
                frames = jnp.asarray(
                    rng.random((bs, 512, 640, 3), dtype=np.float32))
                cache = seg.init_cache(jnp.asarray(
                    rng.random((bs, 4, 512, 640, 3), dtype=np.float32)))

                @jax.jit
                def stream_chain(bb_vars, head_vars, cache, frame):
                    def body(carry, _):
                        c, checksum = carry
                        c, pred = seg._step_fn(bb_vars, head_vars, c,
                                               frame + checksum * 1e-12)
                        return (c, jnp.sum(pred).astype(jnp.float32)), ()

                    (c, s), _ = jax.lax.scan(
                        body, (cache, jnp.float32(0.0)), None, length=N_CHAIN)
                    return s

                args = (seg._bb_vars, seg._head_vars, cache, frames)
                float(stream_chain(*args))
                best = np.inf
                for _ in range(2):
                    t0 = time.perf_counter()
                    float(stream_chain(*args))
                    best = min(best, time.perf_counter() - t0)
                fps = bs * N_CHAIN / best
                print(f"video-serving steady-state bs={bs}: "
                      f"{fps:.2f} frames/sec/chip", file=sys.stderr)
                if stream_best_fps is None or fps > stream_best_fps:
                    stream_best_bs, stream_best_fps = bs, fps
            except Exception as e:
                print(f"streaming bs={bs} probe skipped: {e}",
                      file=sys.stderr)
        if stream_best_fps is not None:
            stream_line = {
                "metric": "endovis18_video_serving_fps_512x640_per_chip",
                "value": round(stream_best_fps, 3),
                "unit": "frames/sec/chip",
                "batch": stream_best_bs,
                "equivalence": "per-frame predictions bit-identical to the "
                               "full-clip forward (tests/test_streaming.py)",
                **_bracket(stream_best_fps),
            }
    except Exception as e:
        print(f"streaming probe skipped: {e}", file=sys.stderr)

    # headline LAST: the video-serving number when available (it runs the
    # same protocol at identical numerics), else the clip path
    if stream_line is not None:
        print(json.dumps(clip_line))
        print(json.dumps(stream_line))
    else:
        print(json.dumps(clip_line))


if __name__ == "__main__":
    main()
