import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
N = 32

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
        t0 = time.perf_counter(); float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N

from stswincl_tpu.models.swin import SwinTemporalStack
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.random((1, 4, 64, 80, 512), dtype=np.float32))
for impl in ("pallas_full", "pallas", "einsum"):
    sw = SwinTemporalStack(dim=512, input_resolution=(64, 80), num_heads=4,
                           attn_impl=impl, dtype=jnp.bfloat16)
    sw_vars = sw.init(jax.random.key(0), feats)
    def fn(v, x, perturb=0.0, _sw=sw):
        s1, s2 = _sw.apply(v, x + perturb)
        return s1.astype(jnp.float32).sum() + s2.astype(jnp.float32).sum()
    t = chain(fn, sw_vars, feats)
    print(f"swin stack ({impl}): {t*1000:.2f} ms", flush=True)
