"""vmap guard for backward Pallas kernels with sequential-grid accumulators.

The fused backward kernels (`pallas_add_ln_mlp.fused_epilogue_bwd[,_streamed]`,
`pallas_block_attention.fused_swin_block_attention_bwd`) carry fp32
weight-gradient accumulators across a SEQUENTIAL grid, indexing
`pl.program_id` by literal axis. Pallas' default batching rule prepends the
vmap axis as a new leading grid dimension, which silently shifts those axis
indices — the kernel then races its accumulator writes and FAULTS THE TPU
WORKER instead of raising (device-bisected 2026-08-19; the reason the
stage-2 query passes are unrolled rather than vmapped,
`train/train_contrast.py`).

`guard_no_vmap` turns that landmine into a Python error: the wrapped call
behaves identically outside vmap, and under vmap raises NotImplementedError
at trace time instead of corrupting device state (guard test:
`tests/test_vmap_guard.py`).
"""

from __future__ import annotations

from jax.custom_batching import custom_vmap


def guard_no_vmap(fn, name: str):
    """Wrap an array-only callable so vmap raises instead of mis-batching.

    `fn` must take/return only arrays or pytrees of arrays (bind static
    config via closure/partial before wrapping)."""
    wrapped = custom_vmap(fn)

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, *args):
        raise NotImplementedError(
            f"{name} cannot be vmapped: its sequential-grid weight-gradient "
            "accumulators index pl.program_id by literal axis, which vmap's "
            "prepended grid dimension invalidates — on TPU this faults the "
            "worker rather than raising (device-bisected 2026-08-19). "
            "Unroll over the batch axis instead (see "
            "train_contrast.make_contrast_train_step's unrolled query "
            "passes).")

    return wrapped
