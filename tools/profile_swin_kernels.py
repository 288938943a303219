"""Per-kernel device-time of the swin block's three fused kernels at bs=8
serving shapes (stage-1 and stage-2), to target the next optimization."""

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


def stage(tag, Bw, T, H, W, C, heads, ws, tokens_note):
    from stswincl_tpu.ops.pallas_block_attention import (
        fused_swin_block_attention)
    from stswincl_tpu.ops.pallas_add_ln_mlp import fused_add_ln_mlp
    from stswincl_tpu.ops.pallas_add_layernorm import fused_add_layer_norm

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.random((Bw, T, H, W, C), dtype=np.float32), dt)
    rows = Bw * T * H * W
    xt = jnp.asarray(rng.random((rows, C), dtype=np.float32), dt)
    yt = jnp.asarray(rng.random((rows, C), dtype=np.float32), dt)

    wqkv = jnp.asarray(rng.random((C, 3 * C), dtype=np.float32) * .02, dt)
    bqkv = jnp.zeros((3 * C,), jnp.float32)
    wproj = jnp.asarray(rng.random((C, C), dtype=np.float32) * .02, dt)
    bproj = jnp.zeros((C,), jnp.float32)
    TN = T * ws * ws
    bias = jnp.zeros((heads, TN, TN), jnp.float32)
    mask = jnp.zeros((1, TN, TN), jnp.float32)
    scale = (C // heads) ** -0.5

    def attn_fn(x, perturb=0.0):
        return fused_swin_block_attention(
            x + perturb.astype(x.dtype), wqkv, bqkv, wproj, bproj,
            bias, mask, heads, scale, ws)

    t_attn = chain(attn_fn, x)

    w1 = jnp.asarray(rng.random((C, 4 * C), dtype=np.float32) * .02, dt)
    b1 = jnp.zeros((4 * C,), jnp.float32)
    w2 = jnp.asarray(rng.random((4 * C, C), dtype=np.float32) * .02, dt)
    b2 = jnp.zeros((C,), jnp.float32)
    s = jnp.ones((C,), jnp.float32)
    b = jnp.zeros((C,), jnp.float32)

    def alm_fn(xt, yt, perturb=0.0):
        su, o = fused_add_ln_mlp(xt + perturb.astype(xt.dtype), yt, s, b,
                                 w1, b1, w2, b2, True)
        return su.astype(jnp.float32).sum() + o.astype(jnp.float32).sum()

    t_alm = chain(alm_fn, xt, yt)

    def ln_fn(xt, yt, perturb=0.0):
        _, o = fused_add_layer_norm(xt + perturb.astype(xt.dtype), yt, s, b,
                                    return_sum=False)
        return o

    t_ln = chain(ln_fn, xt, yt)

    attn_flops = 2 * rows * (C * 4 * C) + 2 * rows * TN * C * 2
    mlp_flops = 2 * rows * C * 4 * C * 2
    peak = 197e12
    print(f"{tag} ({tokens_note}):", flush=True)
    print(f"  attention kernel: {t_attn*1e3:7.3f} ms "
          f"({attn_flops/t_attn/peak*100:5.1f}% MFU)", flush=True)
    print(f"  add+LN+MLP:       {t_alm*1e3:7.3f} ms "
          f"({mlp_flops/t_alm/peak*100:5.1f}% MFU)", flush=True)
    print(f"  final add+LN:     {t_ln*1e3:7.3f} ms", flush=True)


def main():
    # stage-1 at bs=8: blocks see (B*2 groups, 2 frames, 64, 80, 512)
    stage("stage1", 16, 2, 64, 80, 512, 4, 8, "163840 tokens, C=512")
    # stage-2: (B*2, 2, 32, 40, 1024)
    stage("stage2", 16, 2, 32, 40, 1024, 4, 4, "40960 tokens, C=1024")


if __name__ == "__main__":
    main()
