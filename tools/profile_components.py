"""Per-component device-time profile of the inference path (chained scans).

Run on the TPU: times resnet / swin / aspp+heads / upsample separately plus
the full model under both attention implementations.
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

N = 32


def chain(fn, *args):
    """Time fn executed N times serially on device; returns sec/iter."""

    @jax.jit
    def run(*args):
        def body(carry, _):
            out = fn(*args, perturb=carry)
            return jnp.sum(out).astype(jnp.float32) * 1e-12, ()

        final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N)
        return final

    float(run(*args))  # compile + warmup
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
    from stswincl_tpu.ops.resize import resize_bilinear_align_corners

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    # --- resnet on the 4 clip frames ---
    rn = ResNet18OS8(dtype=dtype)
    frames = jnp.asarray(rng.random((4, 512, 640, 3), dtype=np.float32))
    rn_vars = rn.init(jax.random.key(0), frames[:1], train=False)

    def rn_fn(v, x, perturb=0.0):
        return rn.apply(v, x + perturb, train=False)

    t = chain(rn_fn, rn_vars, frames)
    print(f"resnet x4 frames: {t*1000:.2f} ms", flush=True)

    # --- swin stack ---
    sw = SwinTemporalStack(dim=512, input_resolution=(64, 80), num_heads=4,
                           dtype=dtype)
    feats = jnp.asarray(rng.random((1, 4, 64, 80, 512), dtype=np.float32))
    sw_vars = sw.init(jax.random.key(0), feats)

    def sw_fn(v, x, perturb=0.0):
        s1, s2 = sw.apply(v, x + perturb)
        return s1.astype(jnp.float32).sum() + s2.astype(jnp.float32).sum()

    t = chain(sw_fn, sw_vars, feats)
    print(f"swin stack (auto attn): {t*1000:.2f} ms", flush=True)

    sw_e = SwinTemporalStack(dim=512, input_resolution=(64, 80), num_heads=4,
                             attn_impl="einsum", dtype=dtype)

    def sw_e_fn(v, x, perturb=0.0):
        s1, s2 = sw_e.apply(v, x + perturb)
        return s1.astype(jnp.float32).sum() + s2.astype(jnp.float32).sum()

    t = chain(sw_e_fn, sw_vars, feats)
    print(f"swin stack (einsum attn): {t*1000:.2f} ms", flush=True)

    # --- upsample + argmax ---
    logits = jnp.asarray(rng.random((1, 512, 640, 12), dtype=np.float32))

    def up_fn(x, perturb=0.0):
        return jnp.argmax(
            resize_bilinear_align_corners(x + perturb, 1024, 1280), -1
        ).astype(jnp.int32)

    t = chain(up_fn, logits)
    print(f"upsample 1024x1280 + argmax: {t*1000:.2f} ms", flush=True)

    # --- full model ---
    model = TswinPlus(num_classes=12, dtype=dtype)
    x_small = jnp.zeros((1, 4, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x_small, train=False)
    clip = jnp.asarray(rng.random((1, 4, 512, 640, 3), dtype=np.float32))

    def full_fn(v, x, perturb=0.0):
        return model.apply(v, x + perturb, train=False)

    t = chain(full_fn, variables, clip)
    print(f"full model fwd (no upsample, auto attn): {t*1000:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
