"""Per-stage device-time profile of the ResNet18-OS8 backbone (chained scans).

Run on the TPU: isolates stem / layer1 / layer2 / dilated layer4 / dilated
layer5 to locate the conv MFU losses seen in the whole-backbone number.
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

import flax.linen as nn

from stswincl_tpu.models.resnet import ConvBN, BasicBlock

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
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N


class Stem(nn.Module):
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = ConvBN(64, 7, 2, 1, self.dtype, name="stem")(x.astype(self.dtype), train)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class Stage(nn.Module):
    channels: int
    n: int = 2
    stride: int = 1
    dilation: int = 1
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = BasicBlock(self.channels, stride=self.stride,
                       dilation=self.dilation, dtype=self.dtype, name="b0")(x, train)
        for i in range(1, self.n):
            x = BasicBlock(self.channels, dilation=self.dilation,
                           dtype=self.dtype, name=f"b{i}")(x, train)
        return x


def bench(name, mod, shape, flops):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape, dtype=np.float32), jnp.bfloat16)
    v = mod.init(jax.random.key(0), x)

    def fn(v, x, perturb=0.0):
        return mod.apply(v, x + perturb.astype(x.dtype))

    t = chain(fn, v, x)
    mfu = flops / t / 197e12 * 100
    print(f"{name:34s} {t*1000:7.3f} ms   {flops/1e9:7.1f} GFLOP  {mfu:5.1f}% MFU",
          flush=True)


def main():
    B = 4  # four clip frames
    # FLOPs: 2 * K*K*Cin*Cout*Hout*Wout per conv
    f = lambda k, ci, co, h, w: 2 * k * k * ci * co * h * w * B

    bench("stem 7x7/2 (512x640x3)", Stem(), (B, 512, 640, 3),
          f(7, 3, 64, 256, 320))
    bench("layer1 2xBB(64) @128x160", Stage(64), (B, 128, 160, 64),
          4 * f(3, 64, 64, 128, 160))
    bench("layer2 BB(128,s2)+BB @64x80", Stage(128, stride=2),
          (B, 128, 160, 64),
          f(3, 64, 128, 64, 80) + 3 * f(3, 128, 128, 64, 80)
          + f(1, 64, 128, 64, 80))
    bench("layer4 2xBB(256,d2) @64x80", Stage(256, dilation=2),
          (B, 64, 80, 128),
          f(3, 128, 256, 64, 80) + 3 * f(3, 256, 256, 64, 80)
          + f(1, 128, 256, 64, 80))
    bench("layer5 2xBB(512,d4) @64x80", Stage(512, dilation=4),
          (B, 64, 80, 256),
          f(3, 256, 512, 64, 80) + 3 * f(3, 512, 512, 64, 80)
          + f(1, 256, 512, 64, 80))

    # control: same layer5 shape/channels, dilation 1 — isolates the cost of
    # dilation itself at equal FLOPs
    bench("ctrl  2xBB(512,d1) @64x80", Stage(512, dilation=1),
          (B, 64, 80, 256),
          f(3, 256, 512, 64, 80) + 3 * f(3, 512, 512, 64, 80)
          + f(1, 256, 512, 64, 80))


if __name__ == "__main__":
    main()
