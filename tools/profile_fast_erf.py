"""A/B the divide/exp-free erf polynomial (STSWIN_FAST_ERF) on the bs=8
clip path and the two training steps — the GELU erf runs on every hidden
element of every MLP, and the A&S form costs a VPU divide + exp per
element (the epilogue kernels' measured ~74% MFU ceiling, r5 trace).

Usage: python tools/profile_fast_erf.py [clip|train|all]
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

N = 16
B = 8


def _measure(make_fn, *args):
    run = make_fn()
    float(run(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N


def clip_ab():
    from stswincl_tpu.models import TswinPlus
    from stswincl_tpu.ops.resize import composed_upsample_argmax_cf

    H, W, OH, OW = 512, 640, 1024, 1280
    model = TswinPlus(num_classes=12, dtype=jnp.bfloat16)
    x_small = jnp.zeros((1, 4, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x_small, train=False)
    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.random((B, 4, H, W, 3), dtype=np.float32))

    def make_fn():
        # fresh jit wrapper: STSWIN_FAST_ERF is read at trace time
        @jax.jit
        def run(variables, clip):
            def body(carry, _):
                lcf = model.apply(variables, clip + carry * 1e-12,
                                  train=False, head_res_logits=True)
                pred = composed_upsample_argmax_cf(lcf, (H, W), (OH, OW),
                                                   align_out=True)
                return jnp.sum(pred).astype(jnp.float32), ()

            final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N)
            return final

        return run

    for flag in ("0", "1"):
        os.environ["STSWIN_FAST_ERF"] = flag
        dt = _measure(make_fn, variables, clip)
        print(f"clip path bs={B} fast_erf={flag}: {dt * 1e3:.2f} ms/batch "
              f"= {B / dt:.1f} frames/sec/chip")


def train_ab():
    from stswincl_tpu.models import TswinPlus
    from stswincl_tpu.train import SegTrainState, make_seg_train_step, make_adam

    H, W = 512, 640
    model = TswinPlus(num_classes=12, dtype=jnp.bfloat16)
    x_small = jnp.zeros((1, 4, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x_small, train=False)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, 4, H, W, 3), dtype=np.float32))
    labs = jnp.asarray(rng.integers(0, 12, size=(B, H, W)).astype(np.int32))
    tx = make_adam(3e-4)
    ntc = 4

    def make_fn():
        step = make_seg_train_step(model, tx, loss_type="ohem")
        st = SegTrainState.create(variables, tx)

        @jax.jit
        def run(st, imgs, labs):
            def body(s, _):
                s, m = step(s, imgs, labs)
                return s, m["loss"]

            s, losses = jax.lax.scan(body, st, None, length=ntc)
            return losses[-1]

        return lambda *a: run(st, imgs, labs)

    for flag in ("0", "1"):
        os.environ["STSWIN_FAST_ERF"] = flag
        run = make_fn()
        float(run())
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            float(run())
            best = min(best, time.perf_counter() - t0)
        print(f"stage-1 train bs={B} fast_erf={flag}: "
              f"{best / ntc * 1e3:.1f} ms/step")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "clip"
    if which in ("clip", "all"):
        clip_ab()
    if which in ("train", "all"):
        train_ab()
