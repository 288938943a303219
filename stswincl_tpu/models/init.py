"""PyTorch-default weight initializers.

Training-from-scratch parity: torch `nn.Conv2d`/`nn.Linear` default to
kaiming_uniform(a=sqrt(5)) for weights — which reduces to
U(-1/sqrt(fan_in), +1/sqrt(fan_in)) — and the same bound for biases. flax
defaults (lecun_normal, zero bias) give different early training dynamics;
these initializers match torch so loss curves are comparable to the
reference run-for-run.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """flax conv kernel (kh, kw, in, out): fan_in = kh*kw*in."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_dense_kernel_init(key, shape, dtype=jnp.float32):
    """flax dense kernel (in, out): fan_in = in."""
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    """torch bias init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(max(fan_in, 1))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
