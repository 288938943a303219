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

Resilience (round 4): the axon TPU tunnel has twice been observed down at
driver-capture time (`jax.devices()` hangs forever or the backend init
raises UNAVAILABLE — BENCH_r03.json rc=1). The measurement body therefore
runs behind the same shielding the multichip dryrun gate got in round 2
(`__graft_entry__.py:118-186`):

  1. a BOUNDED backend probe in a subprocess (a hang cannot wedge the
     driver's bench step);
  2. the measurement itself in a subprocess with a wall-clock bound, retried
     once with a fresh compilation cache (stale/corrupt cache entries are a
     known failure class);
  3. on persistent unavailability, ONE structured JSON line with
     `error: "tpu_unreachable"` and the last driver-verified numbers
     (BENCH_r02.json), exit code 0 — the driver records a fact, not a
     stack trace.
"""

import json
import os
import subprocess
import sys
import time

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
# last driver-verified numbers (BENCH_r02.json, rc=0): used only in the
# tpu_unreachable fallback line so an outage never erases known history
_LAST_VERIFIED = {
    "round": 2,
    "endovis18_infer_fps_512x640_per_chip": 75.22,
    "endovis18_video_serving_fps_512x640_per_chip": 91.44,
}
PROBE_TIMEOUT_S = 300     # jax.devices() through the tunnel: normally <60s
IMPL_TIMEOUT_S = 3000     # full bench incl. cold compiles through the tunnel

BASELINE_FPS_GENEROUS_CAP = 20.0   # A100-TF32-class upper bound (see doc)
BASELINE_FPS_REALISTIC = 2.6       # V100 fp32, FLOP-scaled from mmseg swin
N_CHAIN = 32
BAND_PROBE_BUDGET_S = 1500  # attempt the band A/B only with half the
                            # IMPL_TIMEOUT_S wall clock still unspent
TRAIN_PROBE_BUDGET_S = 2100  # attempt the train-step metrics only with
                             # ~15 min of the IMPL_TIMEOUT_S wall clock left
N_TRAIN_CHAIN = 4


def _bracket(value):
    return {
        "vs_baseline": round(value / BASELINE_FPS_GENEROUS_CAP, 3),
        "vs_baseline_bracket": [
            round(value / BASELINE_FPS_GENEROUS_CAP, 3),
            round(value / BASELINE_FPS_REALISTIC, 3),
        ],
    }


def _probe_backend(timeout_s=None):
    """Bounded TPU-availability check in a throwaway subprocess.

    `jax.devices()` through the axon tunnel can hang indefinitely when the
    relay is down (observed r3/r4); a subprocess + timeout turns that into
    a clean boolean. Returns (ok, detail_str).
    """
    timeout_s = PROBE_TIMEOUT_S if timeout_s is None else timeout_s
    code = ("import jax; d = jax.devices(); "
            "print('PROBE_OK', d[0].platform, len(d))")
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            cwd=_REPO_DIR, timeout=timeout_s,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    except subprocess.TimeoutExpired:
        return False, f"backend probe timed out after {timeout_s}s"
    if proc.returncode != 0 or "PROBE_OK" not in proc.stdout:
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()
        return False, "; ".join(tail[-3:]) if tail else f"rc={proc.returncode}"
    return True, proc.stdout.strip()


def _run_impl(env, timeout_s=None):
    """Run the measurement body in a subprocess; forward stderr, return
    (rc, stdout). A timeout returns rc=124 instead of hanging the driver."""
    timeout_s = IMPL_TIMEOUT_S if timeout_s is None else timeout_s
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(_REPO_DIR, "bench.py"), "--impl"],
            env=env, cwd=_REPO_DIR, timeout=timeout_s,
            stdout=subprocess.PIPE, stderr=None, text=True)
        return proc.returncode, proc.stdout
    except subprocess.TimeoutExpired as e:
        out = e.stdout.decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
        print(f"bench impl timed out after {timeout_s}s", file=sys.stderr)
        return 124, out


def _emit_unreachable(detail):
    """The structured-failure line: one JSON object per stable metric name,
    rc stays 0 so the driver records the outage as data."""
    for metric in ("endovis18_infer_fps_512x640_per_chip",
                   "endovis18_video_serving_fps_512x640_per_chip"):
        print(json.dumps({
            "metric": metric,
            "value": None,
            "unit": "frames/sec/chip",
            "error": "tpu_unreachable",
            "error_detail": detail,
            "last_verified": _LAST_VERIFIED[metric],
            "last_verified_round": _LAST_VERIFIED["round"],
        }))


def main():
    ok, detail = _probe_backend()
    if not ok:
        print(f"TPU backend unavailable: {detail}", file=sys.stderr)
        _emit_unreachable(detail)
        return

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(_REPO_DIR, ".jax_cache"))
    rc, out = _run_impl(env)
    if rc != 0:
        # a corrupt/stale persistent-cache entry is a known failure class
        # (same retry the dryrun gate has, __graft_entry__.py:167-180)
        print(f"bench impl rc={rc}; retrying with a fresh compilation cache",
              file=sys.stderr)
        import tempfile
        env_fresh = dict(env)
        env_fresh["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
            prefix="jax_cache_bench_")
        rc, out = _run_impl(env_fresh)
    if rc != 0:
        # backend was probe-reachable but the bench still died twice —
        # report it structurally rather than crashing the driver step
        _emit_unreachable(f"bench impl failed twice (rc={rc}) after a "
                          "successful backend probe")
        return
    sys.stdout.write(out)


def _bench_impl():
    t_start = time.perf_counter()
    import jax

    # persistent compilation cache: compiles through the TPU tunnel are slow
    # (minutes); cache hits make repeat runs near-instant. The orchestrator
    # points JAX_COMPILATION_CACHE_DIR at a fresh dir on retry.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.join(_REPO_DIR, ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from stswincl_tpu.models import TswinPlus
    from stswincl_tpu.ops.resize import composed_upsample_argmax_cf

    # BENCH_SMOKE=1: tiny shapes + short chains so the ENTIRE bench path is
    # executable on CPU in seconds — keeps the measurement code rot-free
    # through tunnel outages (the numbers it prints are not benchmarks)
    smoke = os.environ.get("BENCH_SMOKE") == "1"
    (H, W) = (128, 192) if smoke else (512, 640)
    (OH, OW) = (256, 384) if smoke else (1024, 1280)
    n_chain = 2 if smoke else N_CHAIN
    batch_probe = (2,) if smoke else (8, 16)
    # serving throughput keeps scaling past the clip path's saturation
    # point (it runs 1 backbone pass/frame instead of 4) — probe one size
    # further; every per-bs probe is exception-shielded so an OOM or a
    # compile-budget miss cannot cost the smaller batches' results
    stream_probe = (2,) if smoke else (8, 16, 32)

    # smoke runs the FULL measurement plumbing but on compile-light model
    # configs (swin_dim=64 / depths=(2,2), same knobs as the dryrun gate):
    # full-depth CPU compiles of the train probes measured >45 min on a
    # 1-vCPU host — a smoke test must stay minutes-cheap, and its numbers
    # are marked smoke:true precisely because they are not benchmarks
    light = dict(swin_dim=64, swin_depths=(2, 2)) if smoke else {}
    model = TswinPlus(num_classes=12, dtype=jnp.bfloat16, **light)
    # init at small spatial size: same param tree, far cheaper compile
    x_small = jnp.zeros((1, 4, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x_small, train=False)

    def one_frame(variables, clip):
        # protocol: model upsample to input res (base18.py:106) then eval
        # resize to 1024x1280 + argmax (seg18/test.py:152-160); the two
        # bilinear maps are composed into one fused resize+argmax kernel
        lcf = model.apply(variables, clip, train=False, head_res_logits=True)
        return composed_upsample_argmax_cf(lcf, (H, W), (OH, OW),
                                           align_out=True)

    rng = np.random.default_rng(0)

    def _make_chained():
        # a FRESH jit wrapper per call: trace-time config (the
        # STSWIN_ATTN_BAND_ROWS env the band probe flips) must be re-read
        @jax.jit
        def chained(variables, clip):
            def body(carry, _):
                # carry perturbs the input so no two steps are identical and
                # each step depends on the previous one (strict serialization)
                pred = one_frame(variables, clip + carry * 1e-12)
                checksum = jnp.sum(pred).astype(jnp.float32)
                return checksum, checksum

            final, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=n_chain)
            return final

        return chained

    def _clip_fps(chained, bs):
        clipb = jnp.asarray(rng.random((bs, 4, H, W, 3), dtype=np.float32))
        float(chained(variables, clipb))  # compile + warmup
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            float(chained(variables, clipb))  # scalar D2H forces execution
            best = min(best, time.perf_counter() - t0)
        return bs * n_chain / best

    chained = _make_chained()
    bs1_fps = _clip_fps(chained, 1)
    print(f"device-chained throughput bs=1: {bs1_fps:.2f} fps",
          file=sys.stderr)

    # clip path at the throughput-optimal serving batch — the per-chip
    # serving number BASELINE.json's ">5x frames/sec/chip" targets
    best_bs, best_fps = 1, bs1_fps
    for bs in batch_probe:
        try:
            fps = _clip_fps(chained, bs)
            print(f"device-chained throughput bs={bs}: "
                  f"{fps:.2f} frames/sec/chip", file=sys.stderr)
            if fps > best_fps:
                best_bs, best_fps = bs, fps
        except Exception as e:  # memory/compile limits must not kill the bench
            print(f"bs={bs} probe skipped: {e}", file=sys.stderr)

    # video serving (headline): steady-state streaming — the backbone
    # feature cache makes each new frame cost ONE backbone pass; per-frame
    # predictions are numerics-identical to the full-clip forward
    # (tests/test_streaming.py), so this reproduces seg18/test.py outputs
    def _stream_fps(seg, bs):
        frames = jnp.asarray(rng.random((bs, H, W, 3), dtype=np.float32))
        cache = seg.init_cache(jnp.asarray(
            rng.random((bs, 4, H, W, 3), dtype=np.float32)))

        @jax.jit
        def stream_chain(bb_vars, head_vars, cache, frame):
            def body(carry, _):
                c, checksum = carry
                c, pred = seg._step_fn(bb_vars, head_vars, c,
                                       frame + checksum * 1e-12)
                return (c, jnp.sum(pred).astype(jnp.float32)), ()

            (c, s), _ = jax.lax.scan(
                body, (cache, jnp.float32(0.0)), None, length=n_chain)
            return s

        args = (seg._bb_vars, seg._head_vars, cache, frames)
        float(stream_chain(*args))
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            float(stream_chain(*args))
            best = min(best, time.perf_counter() - t0)
        return bs * n_chain / best

    stream_best_bs, stream_best_fps = None, None
    seg = None
    try:
        from stswincl_tpu.pipelines.streaming import StreamingSegmenter

        seg = StreamingSegmenter(model, variables, out_hw=(OH, OW))
        for bs in stream_probe:
            # everything per-bs sits inside the try: a bs=16 OOM during
            # cache warmup must not discard an already-measured bs=8 result
            try:
                fps = _stream_fps(seg, bs)
                print(f"video-serving steady-state bs={bs}: "
                      f"{fps:.2f} frames/sec/chip", file=sys.stderr)
                if stream_best_fps is None or fps > stream_best_fps:
                    stream_best_bs, stream_best_fps = bs, fps
            except Exception as e:
                print(f"streaming bs={bs} probe skipped: {e}",
                      file=sys.stderr)
    except Exception as e:
        print(f"streaming probe skipped: {e}", file=sys.stderr)

    # --- band_rows A/B (round 4): re-measure the best configs with the
    # attention kernels' multi-window-row bands (STSWIN_ATTN_BAND_ROWS=2,
    # pallas_block_attention._resolve_band_rows) — the r3 trace's named
    # candidate for the attention ~51% effective MFU. The knob is read at
    # TRACE time, so fresh jit wrappers / a fresh StreamingSegmenter
    # retrace under it; numerics are band-independent (parity test:
    # tests/test_pallas_block_attention.py). Time-budgeted so two extra
    # cold compiles can never push the bench into the driver's timeout.
    clip_band, stream_band = 1, 1
    band_env = "STSWIN_ATTN_BAND_ROWS"
    prior_band = os.environ.get(band_env)
    if smoke or (time.perf_counter() - t_start) < BAND_PROBE_BUDGET_S:
        try:
            os.environ[band_env] = "2"
            try:
                fps2 = _clip_fps(_make_chained(), best_bs)
                print(f"clip path band_rows=2 bs={best_bs}: "
                      f"{fps2:.2f} frames/sec/chip", file=sys.stderr)
                if fps2 > best_fps:
                    best_fps, clip_band = fps2, 2
            except Exception as e:
                print(f"clip band probe skipped: {e}", file=sys.stderr)
            if seg is not None and stream_best_fps is not None:
                try:
                    seg2 = StreamingSegmenter(model, variables,
                                              out_hw=(OH, OW))
                    fps2 = _stream_fps(seg2, stream_best_bs)
                    print(f"video serving band_rows=2 bs={stream_best_bs}: "
                          f"{fps2:.2f} frames/sec/chip", file=sys.stderr)
                    if fps2 > stream_best_fps:
                        stream_best_fps, stream_band = fps2, 2
                except Exception as e:
                    print(f"stream band probe skipped: {e}", file=sys.stderr)
        finally:
            if prior_band is None:
                os.environ.pop(band_env, None)
            else:
                os.environ[band_env] = prior_band
    else:
        print("band probe skipped: time budget exhausted", file=sys.stderr)

    # --- training throughput (round 5): the 415/300 ms/step claims were
    # builder-measured only through r4 (`tools/profile_{train,contrast}_step`
    # runs the driver never captures). Measure both hot training loops here
    # so BENCH_r0N.json carries them: stage-1 seg step at the reference
    # config (bs=8, 512x640, OHEM — `seg18/train_swin.py:149-183`) and the
    # stage-2 contrastive step (bs=4, 6 views of 256x448 —
    # `main_pretrain_swinv5.py:149-196`). Same chained-scan discipline as
    # the inference numbers (state threads through the scan carry, so the
    # device must run every step), time-budgeted so two more cold compiles
    # can never push the bench into the driver's timeout, and each probe is
    # independently shielded — a train-path failure must not cost the
    # already-measured inference lines.
    train_lines = []
    if smoke or (time.perf_counter() - t_start) < TRAIN_PROBE_BUDGET_S:
        ntc = 2 if smoke else N_TRAIN_CHAIN

        def _steps_per_sec(step_fn, state, *batch):
            @jax.jit
            def chained(state, *batch):
                def body(st, _):
                    st, m = step_fn(st, *batch)
                    return st, m["loss"]
                st, losses = jax.lax.scan(body, state, None, length=ntc)
                return losses[-1]

            float(chained(state, *batch))  # compile + warmup
            best = np.inf
            for _ in range(2):
                t0 = time.perf_counter()
                float(chained(state, *batch))
                best = min(best, time.perf_counter() - t0)
            return ntc / best

        try:
            from stswincl_tpu.train import (SegTrainState, make_seg_train_step,
                                            make_adam)

            tb = 2 if smoke else 8
            th, tw = (H, W)
            tx = make_adam(3e-4)
            st1 = SegTrainState.create(variables, tx)
            seg_step = make_seg_train_step(model, tx, loss_type="ohem")
            imgs = jnp.asarray(rng.random((tb, 4, th, tw, 3), dtype=np.float32))
            labs = jnp.asarray(
                rng.integers(0, 12, size=(tb, th, tw)).astype(np.int32))
            sps = _steps_per_sec(seg_step, st1, imgs, labs)
            print(f"stage-1 train step bs={tb} {th}x{tw} ohem: "
                  f"{1000.0 / sps:.1f} ms/step = {tb * sps:.1f} clips/sec",
                  file=sys.stderr)
            train_lines.append({
                "metric": "endovis18_train_ms_per_step",
                "value": round(1000.0 / sps, 1),
                "unit": "ms/step",
                "batch": tb, "input": f"{th}x{tw}", "loss": "ohem",
                "clips_per_sec_per_chip": round(tb * sps, 2),
                **({"smoke": True} if smoke else {}),
            })
        except Exception as e:
            print(f"stage-1 train probe skipped: {e}", file=sys.stderr)
        try:
            from stswincl_tpu.models import ContrastEncoder
            from stswincl_tpu.train import (ContrastTrainState,
                                            make_contrast_train_step,
                                            make_lars,
                                            warmup_cosine_schedule)

            cb = 2 if smoke else 4
            ch, cw = (64, 128) if smoke else (256, 448)
            cmodel = ContrastEncoder(num_classes=12, dtype=jnp.bfloat16,
                                     **light)
            cclips = jnp.asarray(
                rng.random((cb, 6, 4, ch, cw, 3), dtype=np.float32))
            clabs = jnp.asarray(
                rng.integers(0, 12, (cb, 6, ch, cw)).astype(np.int32))
            cv = cmodel.init(jax.random.key(0), cclips[:1, 0], train=False)
            ctx = make_lars(warmup_cosine_schedule(1.0, 5, 150))
            st2 = ContrastTrainState.create(cv, ctx)
            con_step = make_contrast_train_step(cmodel, ctx, class_num=12,
                                                total_steps=1000)
            sps = _steps_per_sec(con_step, st2, cclips, clabs)
            print(f"stage-2 contrast step bs={cb} {ch}x{cw}: "
                  f"{1000.0 / sps:.1f} ms/step = {cb * sps:.2f} samples/sec",
                  file=sys.stderr)
            train_lines.append({
                "metric": "pretrain_contrast_ms_per_step",
                "value": round(1000.0 / sps, 1),
                "unit": "ms/step",
                "batch": cb, "views": 6, "crop": f"{ch}x{cw}",
                "samples_per_sec_per_chip": round(cb * sps, 2),
                **({"smoke": True} if smoke else {}),
            })
        except Exception as e:
            print(f"stage-2 train probe skipped: {e}", file=sys.stderr)
    else:
        print("train probes skipped: time budget exhausted", file=sys.stderr)

    clip_line = {
        "metric": "endovis18_infer_fps_512x640_per_chip",
        "value": round(best_fps, 3),
        "unit": "frames/sec/chip",
        "batch": best_bs,
        "bs1_fps": round(bs1_fps, 3),
        "band_rows": clip_band,
        **_bracket(best_fps),
        # smoke mode runs tiny shapes on CPU — mark so the numbers can
        # never be mistaken for a TPU benchmark
        **({"smoke": True} if smoke else {}),
    }
    stream_line = None
    if stream_best_fps is not None:
        stream_line = {
            "metric": "endovis18_video_serving_fps_512x640_per_chip",
            "value": round(stream_best_fps, 3),
            "unit": "frames/sec/chip",
            "batch": stream_best_bs,
            "band_rows": stream_band,
            "equivalence": "per-frame predictions bit-identical to the "
                           "full-clip forward (tests/test_streaming.py)",
            **_bracket(stream_best_fps),
            **({"smoke": True} if smoke else {}),
        }

    # headline LAST: the video-serving number when available (it runs the
    # same protocol at identical numerics), else the clip path
    print(json.dumps(clip_line))
    for line in train_lines:
        print(json.dumps(line))
    if stream_line is not None:
        print(json.dumps(stream_line))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--impl":
        _bench_impl()
    else:
        main()
