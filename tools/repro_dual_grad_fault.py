"""Minimal repro for the dual-query-grad TPU-worker fault (r4 bisect).

Finding (device-bisected 2026-08-19, 18 runs): at the stage-2 reference
config (bs=4, 256x448 crops) a program whose backward holds the
fused-epilogue backward residual sets of TWO ContrastEncoder query views
simultaneously faults the TPU worker (the runtime connection dies — no
Python exception). ONE view's grad passes; two fault in every co-resident
formulation (vmapped, unrolled, or with einsum attention); the all-XLA
path and the remat form pass. The shipped default
(`make_contrast_train_step(remat_queries=True)`) avoids it by
checkpointing each query-view forward — bitwise-identical grads at ~9%
step-time cost (300 vs 275 ms/step).

Usage:
  python tools/repro_dual_grad_fault.py            # 1-view grad: PASSES
  python tools/repro_dual_grad_fault.py --dual     # 2-view grad: FAULTS the
                                                   # TPU worker (you will
                                                   # need a fresh runtime)
  python tools/repro_dual_grad_fault.py --remat    # 2-view grad under
                                                   # jax.checkpoint: PASSES

Keep `--dual` off shared hardware you care about: the fault kills the TPU
runtime process, not just this script.
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
    dual = "--dual" in sys.argv
    remat = "--remat" in sys.argv

    from stswincl_tpu.models import ContrastEncoder
    from stswincl_tpu.train.train_contrast import _encode_train

    B, T, H, W = 4, 4, 256, 448
    model = ContrastEncoder(num_classes=12, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.random((B, 2, T, H, W, 3), dtype=np.float32))
    v = model.init(jax.random.key(0), clips[:1, 0], train=False)
    params, stats = v["params"], v.get("batch_stats", {})
    zeros = jax.tree.map(jnp.zeros_like, stats)

    enc = (jax.checkpoint(_encode_train, static_argnums=(0,)) if remat
           else _encode_train)

    def loss_fn(params):
        q1, _ = enc(model, params, zeros, clips[:, 0])
        total = jnp.sum(q1.astype(jnp.float32) ** 2)
        if dual or remat:
            q2, _ = enc(model, params, zeros, clips[:, 1])
            total = total + jnp.sum(q2.astype(jnp.float32) ** 2)
        return total

    mode = ("2-view remat" if remat else
            "2-view co-resident (EXPECTED TO FAULT THE TPU WORKER)" if dual
            else "1-view")
    print(f"mode: {mode}; compiling grad at bs={B}, {H}x{W}...", flush=True)
    grad = jax.jit(jax.grad(loss_fn))
    t0 = time.perf_counter()
    g = grad(params)
    gn = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)), g, 0.0))
    print(f"grad OK in {time.perf_counter() - t0:.1f}s, |g|_1 = {gn:.4g}",
          flush=True)


if __name__ == "__main__":
    main()
