"""The bench.py resilience layer (round-4 hardening).

The driver runs `python bench.py` at round end; the axon TPU tunnel has been
observed down at exactly that moment twice (BENCH_r03.json rc=1). These
tests pin the orchestration contract WITHOUT any jax/TPU dependency:

  * unreachable backend  -> structured `error: tpu_unreachable` JSON lines,
    carrying the last driver-verified numbers, and main() returns normally
    (rc 0 at the process level);
  * happy path           -> the impl subprocess's stdout is forwarded
    verbatim;
  * one impl failure     -> a single fresh-compilation-cache retry.
"""

import importlib.util
import io
import json
import os
import sys

_BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _capture_main(bench):
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        bench.main()
    finally:
        sys.stdout = old
    return buf.getvalue()


def test_unreachable_backend_emits_structured_lines(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "_probe_backend",
                        lambda timeout_s=None: (False, "probe timed out"))
    out = _capture_main(bench)
    lines = [json.loads(l) for l in out.strip().splitlines()]
    assert len(lines) == 2
    for line in lines:
        assert line["error"] == "tpu_unreachable"
        assert line["value"] is None
        assert line["last_verified"] > 0
        assert line["metric"].startswith("endovis18_")
        assert line["unit"] == "frames/sec/chip"


def test_happy_path_forwards_impl_stdout(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "_probe_backend",
                        lambda timeout_s=None: (True, "PROBE_OK axon 1"))
    payload = json.dumps({"metric": "m", "value": 1.0}) + "\n"
    calls = []
    monkeypatch.setattr(bench, "_run_impl",
                        lambda env, timeout_s=None:
                        (calls.append(env), (0, payload))[1])
    out = _capture_main(bench)
    assert out == payload
    assert len(calls) == 1


def test_impl_failure_retries_once_with_fresh_cache(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "_probe_backend",
                        lambda timeout_s=None: (True, "PROBE_OK axon 1"))
    cache_dirs = []

    def fake_impl(env, timeout_s=None):
        cache_dirs.append(env.get("JAX_COMPILATION_CACHE_DIR"))
        return 1, ""

    monkeypatch.setattr(bench, "_run_impl", fake_impl)
    out = _capture_main(bench)
    # two attempts, second with a different (fresh) cache dir
    assert len(cache_dirs) == 2
    assert cache_dirs[0] != cache_dirs[1]
    # persistent failure after a good probe still emits structured lines
    lines = [json.loads(l) for l in out.strip().splitlines()]
    assert len(lines) == 2
    assert all(l["error"] == "tpu_unreachable" for l in lines)


def test_probe_timeout_is_bounded():
    bench = _load_bench()
    # a probe against a command that sleeps must return within the bound
    import time

    # patch subprocess.run inside the module to a sleeper via timeout math:
    # cheaper and more portable than spawning a real hanging jax import —
    # use an actual subprocess that sleeps longer than the timeout
    import subprocess as sp

    class Stub:
        PIPE = sp.PIPE
        TimeoutExpired = sp.TimeoutExpired

        @staticmethod
        def run(cmd, **kw):
            raise sp.TimeoutExpired(cmd, kw.get("timeout"))

    bench.subprocess = Stub
    t0 = time.perf_counter()
    ok, detail = bench._probe_backend(timeout_s=1)
    assert not ok
    assert "timed out" in detail
    assert time.perf_counter() - t0 < 5
