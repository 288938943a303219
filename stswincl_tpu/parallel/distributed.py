"""Multi-host initialization.

Replaces `dist.init_process_group('nccl')` + `torch.distributed.launch`
(`seg18/train_swin.py:76-77`, `main_pretrain_swinv5.py:244-245`) with
`jax.distributed.initialize`: on TPU pods the coordinator/topology comes
from the environment, so a bare call suffices; explicit addresses cover
CPU/GPU-style launches. All collectives afterwards ride ICI/DCN via XLA —
there is no backend selection.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX if running in a multi-process environment.

    No-op when single-process (the common single-host dev loop) or when
    already initialized.
    """
    if jax.process_count() > 1:
        return  # already initialized by the runtime
    env_addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if env_addr is None and num_processes is None:
        return  # single process
    try:
        jax.distributed.initialize(
            coordinator_address=env_addr,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized
