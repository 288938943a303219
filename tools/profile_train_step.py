"""Measure the stage-1 training-step throughput on TPU (chained scans)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from stswincl_tpu.models import TswinPlus
from stswincl_tpu.train import SegTrainState, make_seg_train_step, make_adam

N = 8
model = TswinPlus(num_classes=12, dtype=jnp.bfloat16)
B, T, H, W = 8, 4, 512, 640
x_small = jnp.zeros((1, T, 64, 128, 3), jnp.float32)
v = model.init(jax.random.key(0), x_small, train=False)
tx = make_adam(3e-4)
state = SegTrainState.create(v, tx)
step = make_seg_train_step(model, tx, loss_type="ohem")

rng = np.random.default_rng(0)
images = jnp.asarray(rng.random((B, T, H, W, 3), dtype=np.float32))
labels = jnp.asarray(rng.integers(0, 12, size=(B, H, W)).astype(np.int32))

@jax.jit
def chained(state, images, labels):
    def body(st, _):
        st, m = step.__wrapped__(st, images, labels) if hasattr(step, '__wrapped__') else step(st, images, labels)
        return st, m["loss"]
    st, losses = jax.lax.scan(body, state, None, length=N)
    return losses[-1]

loss = float(chained(state, images, labels))
print("compiled, loss:", loss, flush=True)
best = np.inf
for _ in range(2):
    t0 = time.perf_counter()
    float(chained(state, images, labels))
    best = min(best, time.perf_counter() - t0)
print(f"train step (bs=8, 512x640, ohem): {best/N*1000:.1f} ms/step "
      f"= {B*N/best:.1f} clips/sec/chip", flush=True)
