"""Fused conv kernel vs XLA conv on the ResNet dilated-stage shapes (TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from stswincl_tpu.ops import pallas_conv

N_CHAIN = 32


def chain(fn, *args):
    @jax.jit
    def run(*args):
        def body(carry, _):
            out = fn(*args, perturb=carry)
            return jnp.sum(out).astype(jnp.float32) * 1e-12, ()

        final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N_CHAIN)
        return final

    float(run(*args))
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N_CHAIN


def bench_shape(name, B, H, W, cin, cout, d, with_res):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, cin)).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(
        rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.02,
        jnp.bfloat16)
    scale = jnp.ones((cout,), jnp.float32)
    shift = jnp.zeros((cout,), jnp.float32)
    res = jnp.asarray(rng.standard_normal((B, H, W, cout)).astype(np.float32),
                      jnp.bfloat16) if with_res else None

    flops = 2 * B * H * W * cin * cout * 9
    peak = 197e12

    def pallas_fn(x, w, scale, shift, perturb=0.0):
        return pallas_conv.conv3x3_bn_act(
            x + perturb.astype(x.dtype), w, scale, shift, dilation=d,
            relu=True, residual=res)

    def xla_fn(x, w, scale, shift, perturb=0.0):
        y = jax.lax.conv_general_dilated(
            x + perturb.astype(x.dtype), w, (1, 1), ((d, d), (d, d)),
            rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = y * scale + shift
        if res is not None:
            y = y + res.astype(jnp.float32)
        return jnp.maximum(y, 0.0).astype(x.dtype)

    if pallas_conv.supports(x.shape, w.shape, d, 1):
        tp = chain(pallas_fn, x, w, scale, shift)
        ps = f"pallas {tp*1e3:7.3f} ms ({flops/tp/peak*100:5.1f}% MFU)"
    else:
        # e.g. 64-ch layer1: Mosaic rejects sub-128 lane slices in the DMA
        ps = "pallas   (out of envelope)     "
    tx = chain(xla_fn, x, w, scale, shift)
    print(f"{name:36s} {ps}"
          f"   xla {tx*1e3:7.3f} ms ({flops/tx/peak*100:5.1f}% MFU)",
          flush=True)


def main():
    for B in (4, 32):
        bench_shape(f"layer5 512->512 d4 B{B}", B, 64, 80, 512, 512, 4, True)
        bench_shape(f"layer5 256->512 d4 B{B}", B, 64, 80, 256, 512, 4, True)
        bench_shape(f"layer4 256->256 d2 B{B}", B, 64, 80, 256, 256, 2, True)
        bench_shape(f"layer4 128->256 d2 B{B}", B, 64, 80, 128, 256, 2, True)
        # early stages (r5 trace: the remaining low-MFU convs)
        bench_shape(f"layer1  64->64  d1 B{B}", B, 128, 160, 64, 64, 1, True)
        bench_shape(f"layer2 128->128 d1 B{B}", B, 64, 80, 128, 128, 1, True)


if __name__ == "__main__":
    main()
