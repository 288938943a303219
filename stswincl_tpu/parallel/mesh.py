"""Device mesh + sharding utilities (the distributed layer).

Replaces the reference's NCCL plumbing (`dist.init_process_group('nccl')`,
DataParallel/DDP wraps, SyncBatchNorm conversion, DistributedSampler —
SURVEY.md §2.4) with the pjit/GSPMD model:

  * one `jax.sharding.Mesh` with a `data` axis spanning all chips (ICI
    within a slice, DCN across slices — XLA routes collectives);
  * the batch is sharded over `data`; parameters are replicated;
  * gradients come out of `jax.grad` already averaged globally because the
    loss is a mean over a sharded batch — XLA inserts the psum (the DDP
    all-reduce equivalent, for free);
  * BatchNorm statistics are GLOBAL means over the sharded batch axis for
    the same reason — SyncBatchNorm semantics by construction, no
    conversion pass needed;
  * `all_gather` of contrastive features across chips (the reference's
    unused `dist_collect`, `contrast/util.py:47-58`) is expressed by simply
    computing on the global batch: keys from every chip participate in the
    loss when the loss term contracts over the full batch axis.

A `model` axis is reserved for tensor-parallel extension; at this model
scale (~60M params) data parallelism saturates the chips, matching the
reference's parallelism envelope.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1D (or reshaped) mesh over the first `n_devices` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if len(axis_names) == 1:
        shape = (n,)
    else:
        # fill trailing axes with 1 unless caller reshapes explicitly
        shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host-side batch pytree onto the mesh, sharded on dim 0."""
    s = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, optimizer state) across the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
