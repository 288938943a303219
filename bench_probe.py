import time, numpy as np, jax, jax.numpy as jnp
from stswincl_tpu.models import TswinPlus
from stswincl_tpu.train import make_seg_eval_step

model = TswinPlus(num_classes=12, dtype=jnp.bfloat16)
x_small = jnp.zeros((1,4,64,128,3), jnp.float32)
t0=time.perf_counter()
variables = model.init(jax.random.key(0), x_small, train=False)
print('small init s:', time.perf_counter()-t0, flush=True)
params, stats = variables['params'], variables['batch_stats']
ev = make_seg_eval_step(model, out_hw=(1024,1280))
rng = np.random.default_rng(0)
clips = [jnp.asarray(rng.random((1,4,512,640,3), dtype=np.float32)) for _ in range(8)]
t0=time.perf_counter()
_ = np.asarray(ev(params, stats, clips[0]))
print('compile+first s:', time.perf_counter()-t0, flush=True)
# per-call with forced host materialization (protocol includes D2H copy)
times=[]
for i in range(16):
    t0=time.perf_counter()
    o = np.asarray(ev(params, stats, clips[i%8]))
    times.append(time.perf_counter()-t0)
print('per-call (np.asarray) s:', [round(t,4) for t in times], flush=True)
print('median fps incl D2H:', 1.0/np.median(times), flush=True)
# pipelined: dispatch all, then materialize all (overlap)
t0=time.perf_counter()
outs=[ev(params, stats, clips[i%8]) for i in range(16)]
res=[np.asarray(o) for o in outs]
dt=time.perf_counter()-t0
print('pipelined fps incl D2H:', 16/dt, flush=True)
