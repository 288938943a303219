"""Per-component device-time profile at serving batch (bs=8 clips).

Locates the remaining gap to the ~8.8ms/frame bf16 roofline after the
attention/LN+MLP fusions and the final-layer dead-group skip.
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


def chain(fn, *args):
    @jax.jit
    def run(*args):
        def body(carry, _):
            out = fn(*args, perturb=carry)
            return jnp.sum(out).astype(jnp.float32) * 1e-12, ()

        final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N)
        return final

    float(run(*args))
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N


def main():
    from stswincl_tpu.models import TswinPlus
    from stswincl_tpu.models.resnet import ResNet18OS8
    from stswincl_tpu.models.swin import SwinTemporalStack
    from stswincl_tpu.models.aspp import ASPP
    from stswincl_tpu.ops.resize import upsample_argmax

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    # --- resnet on B*T frames ---
    rn = ResNet18OS8(dtype=dtype)
    frames = jnp.asarray(rng.random((B * 4, 512, 640, 3), dtype=np.float32))
    rn_vars = rn.init(jax.random.key(0), frames[:1], train=False)

    def rn_fn(v, x, perturb=0.0):
        return rn.apply(v, x + perturb, train=False)

    t = chain(rn_fn, rn_vars, frames)
    print(f"resnet x{B*4} frames: {t*1000:.2f} ms ({t/B*1000:.2f}/frame)",
          flush=True)

    # --- swin stack (with final_pair_only, serving config) ---
    sw = SwinTemporalStack(dim=512, input_resolution=(64, 80), num_heads=4,
                           final_pair_only=True, dtype=dtype)
    feats = jnp.asarray(rng.random((B, 4, 64, 80, 512), dtype=np.float32))
    sw_vars = sw.init(jax.random.key(0), feats)

    def sw_fn(v, x, perturb=0.0):
        s1, s2 = sw.apply(v, x + perturb)
        return s1.astype(jnp.float32).sum() + s2.astype(jnp.float32).sum()

    t = chain(sw_fn, sw_vars, feats)
    print(f"swin stack: {t*1000:.2f} ms ({t/B*1000:.2f}/frame)", flush=True)

    # --- ASPP on last-frame stage2 ---
    aspp = ASPP(1024, 256, dtype=dtype)
    s2 = jnp.asarray(rng.random((B, 32, 40, 1024), dtype=np.float32))
    a_vars = aspp.init(jax.random.key(0), s2, False)

    def a_fn(v, x, perturb=0.0):
        return aspp.apply(v, x + perturb, False)

    t = chain(a_fn, a_vars, s2)
    print(f"aspp: {t*1000:.2f} ms ({t/B*1000:.2f}/frame)", flush=True)

    # --- eval upsample+argmax ---
    logits = jnp.asarray(rng.random((B, 512, 640, 12), dtype=np.float32))

    def up_fn(x, perturb=0.0):
        return upsample_argmax(x + perturb, 1024, 1280)

    t = chain(up_fn, logits)
    print(f"upsample+argmax: {t*1000:.2f} ms ({t/B*1000:.2f}/frame)",
          flush=True)

    # --- full model (no final upsample) ---
    model = TswinPlus(num_classes=12, dtype=dtype)
    x_small = jnp.zeros((1, 4, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x_small, train=False)
    clip = jnp.asarray(rng.random((B, 4, 512, 640, 3), dtype=np.float32))

    def full_fn(v, x, perturb=0.0):
        return model.apply(v, x + perturb, train=False)

    t = chain(full_fn, variables, clip)
    print(f"full model fwd: {t*1000:.2f} ms ({t/B*1000:.2f}/frame)",
          flush=True)


if __name__ == "__main__":
    main()
