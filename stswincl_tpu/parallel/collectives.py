"""Named-axis collective wrappers.

TPU-native equivalents of the reference's only first-party distributed
helpers (`pixcontrast_18/contrast/util.py:47-65`): `dist_collect` (all-gather
features across ranks, used to widen contrastive negative pools) and
`reduce_tensor` (mean all-reduce). Under pjit these are usually implicit —
computing on a batch sharded over the `data` axis makes XLA insert the
collectives — but the explicit forms are needed inside `shard_map` regions
and Pallas kernels, and they document intent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def dist_collect(x: jnp.ndarray, axis_name: str = "data") -> jnp.ndarray:
    """All-gather along a named mesh axis, concatenated on dim 0 — the
    `dist_collect` equivalent (`util.py:47-58`). Call inside shard_map/pmap.
    """
    gathered = jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
    return gathered


def reduce_mean(x: jnp.ndarray, axis_name: str = "data") -> jnp.ndarray:
    """Mean all-reduce — `reduce_tensor` equivalent (`util.py:61-65`)."""
    return jax.lax.pmean(x, axis_name)


def reduce_sum(x: jnp.ndarray, axis_name: str = "data") -> jnp.ndarray:
    return jax.lax.psum(x, axis_name)


def cross_replica_batch_norm_stats(x: jnp.ndarray, axis_name: str = "data"):
    """Global (mean, var) over batch+spatial dims AND the mesh axis — the
    SyncBatchNorm primitive (`PixPro_swin_v5.py:215-228` equivalent) for
    explicitly-replicated (shard_map) code paths. Under plain pjit this is
    unnecessary: reductions over sharded axes are already global."""
    reduce_dims = tuple(range(x.ndim - 1))
    mean = jax.lax.pmean(jnp.mean(x, axis=reduce_dims), axis_name)
    mean_sq = jax.lax.pmean(jnp.mean(jnp.square(x), axis=reduce_dims),
                            axis_name)
    return mean, mean_sq - jnp.square(mean)
