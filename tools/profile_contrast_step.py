import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from stswincl_tpu.models import ContrastEncoder
from stswincl_tpu.train import ContrastTrainState, make_contrast_train_step, make_lars, warmup_cosine_schedule

B, T, H, W = 4, 4, 256, 448   # reference stage-2 config (bs 4, 256x448 crops)
rng = np.random.default_rng(0)
clips = jnp.asarray(rng.random((B, 6, T, H, W, 3), dtype=np.float32))
labels = jnp.asarray(rng.integers(0, 12, (B, 6, H, W)).astype(np.int32))
model = ContrastEncoder(num_classes=12, dtype=jnp.bfloat16)
v = model.init(jax.random.key(0), clips[:1, 0], train=False)
tx = make_lars(warmup_cosine_schedule(1.0, 5, 150))
state = ContrastTrainState.create(v, tx)
step = make_contrast_train_step(model, tx, class_num=12, total_steps=1000)
state, m = step(state, clips, labels); float(m["loss"])
print("compiled, loss:", float(m["loss"]), flush=True)
N = 8
t0 = time.perf_counter()
for _ in range(N):
    state, m = step(state, clips, labels)
float(m["loss"])
dt = (time.perf_counter() - t0) / N
print(f"contrast step (bs=4, 6 clips, 256x448): {dt*1e3:.1f} ms/step = {B/dt:.2f} samples/s", flush=True)
