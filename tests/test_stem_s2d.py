"""Space-to-depth stem conv: exact math vs the direct 7x7/s2 conv.

The route is opt-in (STSWIN_S2D_STEM=1) after measuring NEGATIVE in-model
on v5e — see `ops/stem_s2d.py::stem_s2d_applicable` — but the math record
stays pinned.
"""

import numpy as np
import jax
import jax.numpy as jnp

from stswincl_tpu.ops.stem_s2d import (stem_s2d_conv, stem_s2d_conv_split,
                                       s2d_stem_kernel, space_to_depth,
                                       stem_s2d_applicable)


def test_s2d_conv_matches_direct(rng):
    x = jnp.asarray(rng.standard_normal((2, 32, 48, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 16)) * 0.1, jnp.float32)
    direct = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = stem_s2d_conv(x, w, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def test_s2d_conv_split_matches_direct(rng):
    """Split-parity route (r5 second attempt, also measured negative —
    tools/profile_stem_split.py): same math, fp32-exact vs direct up to
    the two-conv fp32 add."""
    x = jnp.asarray(rng.standard_normal((2, 32, 48, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 16)) * 0.1, jnp.float32)
    direct = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = stem_s2d_conv_split(x, w, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def test_s2d_kernel_scatter_is_exact(rng):
    """Every original tap appears exactly once; the lone out-of-range tap
    (dy = -1) is zero."""
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 4)), jnp.float32)
    wz = np.asarray(s2d_stem_kernel(w))
    assert wz.shape == (4, 4, 12, 4)
    # sum of |weights| preserved (zeros added, nothing lost)
    np.testing.assert_allclose(np.abs(wz).sum(), np.abs(np.asarray(w)).sum(),
                               rtol=1e-6)


def test_space_to_depth_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 3)), jnp.float32)
    z = np.asarray(space_to_depth(x))
    xn = np.asarray(x)
    for a in range(2):
        for b in range(2):
            np.testing.assert_array_equal(
                z[..., (a * 2 + b) * 3:(a * 2 + b) * 3 + 3],
                xn[:, a::2, b::2, :])


def test_route_defaults_off(rng):
    # negative measurement -> must not route without the env opt-in
    x = jnp.zeros((2, 32, 48, 3), jnp.float32)
    assert not stem_s2d_applicable(x, 7, 2)
