"""Test configuration: force an 8-device CPU platform.

Mirrors the test strategy laid out in SURVEY.md §4: unit tests run on a
virtual 8-device CPU mesh so multi-chip sharding logic is exercised without
TPU hardware, and numeric parity tests compare against small PyTorch tensors
in full fp32 (no TPU bf16 matmul truncation).

Note: this environment registers the TPU PJRT plugin in `sitecustomize`, so
jax is already imported (with JAX_PLATFORMS=axon captured) before pytest
starts — env vars are too late; `jax.config.update` is the reliable switch.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
