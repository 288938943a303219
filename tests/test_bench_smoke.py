"""End-to-end rot-free check of the bench MEASUREMENT body.

`tests/test_bench_resilience.py` pins the orchestration shell (probe /
retry / structured outage lines) without jax; this test runs the actual
measurement code — `bench.py --impl` under BENCH_SMOKE=1 — on CPU with tiny
shapes, so a refactor of the model/streaming/band-probe path that would
crash the driver's end-of-round bench fails here first. The numbers it
produces are not benchmarks (and are marked `smoke: true` for that reason).
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_impl_smoke_emits_both_metrics():
    env = dict(os.environ)
    env["BENCH_SMOKE"] = "1"
    # fresh subprocess: JAX_PLATFORMS is honored (inside pytest jax is
    # already imported, see conftest.py); reuse the suite's persistent
    # CPU compile cache so re-runs are cheap. The axon sitecustomize must
    # be disarmed too — with the plugin registered, backend resolution can
    # still reach for the TPU tunnel (same scrub as __graft_entry__.py:142)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    from conftest import _cpu_cache_dir
    env["JAX_COMPILATION_CACHE_DIR"] = _cpu_cache_dir()
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py"), "--impl"],
        env=env, cwd=_REPO, timeout=2700,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(l) for l in proc.stdout.strip().splitlines()]
    metrics = {l["metric"]: l for l in lines}
    assert set(metrics) == {
        "endovis18_infer_fps_512x640_per_chip",
        "endovis18_train_ms_per_step",
        "pretrain_contrast_ms_per_step",
        "endovis18_video_serving_fps_512x640_per_chip",
    }
    for line in metrics.values():
        assert line["smoke"] is True          # never mistakable for a bench
        assert line["value"] > 0
    for key in ("endovis18_infer_fps_512x640_per_chip",
                "endovis18_video_serving_fps_512x640_per_chip"):
        assert metrics[key]["band_rows"] in (1, 2)  # the A/B ran and chose
        assert metrics[key]["unit"] == "frames/sec/chip"
    for key in ("endovis18_train_ms_per_step", "pretrain_contrast_ms_per_step"):
        assert metrics[key]["unit"] == "ms/step"
    # headline (video serving) printed LAST — the driver keys on this
    assert lines[-1]["metric"] == "endovis18_video_serving_fps_512x640_per_chip"
