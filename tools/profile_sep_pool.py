"""Same-session in-model A/B of the separable stem maxpool
(models/resnet.py::max_pool_3x3_s2, STSWIN_SEP_POOL knob) on the bs=8
clip path. Chained-scan timing, same discipline as bench.py."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from stswincl_tpu.models import TswinPlus
from stswincl_tpu.ops.resize import composed_upsample_argmax_cf

N = 24
B = 8


def _measure(make_fn, variables, clip):
    run = make_fn()
    float(run(variables, clip))  # compile + settle
    t0 = time.perf_counter()
    float(run(variables, clip))
    return (time.perf_counter() - t0) / N


def main():
    H, W, OH, OW = 512, 640, 1024, 1280
    model = TswinPlus(num_classes=12, dtype=jnp.bfloat16)
    x_small = jnp.zeros((1, 4, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x_small, train=False)
    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.random((B, 4, H, W, 3), dtype=np.float32))

    def make_fn():
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

    for flag in ("0", "1", "0", "1"):
        os.environ["STSWIN_SEP_POOL"] = flag
        dt = _measure(make_fn, variables, clip)
        print(f"clip path bs={B} sep_pool={flag}: {dt * 1e3:.2f} ms/batch "
              f"= {B / dt:.1f} frames/sec/chip", flush=True)


if __name__ == "__main__":
    main()
