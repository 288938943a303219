"""Logging / metric observability.

Capability parity with the reference's logging stack (`seg18/utils/
summary.py:9-111` tensorboardX writer with pickle fallback + rank-0 gating +
file/stdout logger; `contrast/logger.py:31-94` per-rank files): a process-0
gated stdout/file logger, an `AverageMeter`, and a `MetricLogger` that
writes JSONL scalars (always) and TensorBoard event files when TF is
available — JSONL being the fallback analogous to the reference's pickle
fallback path.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


def is_main_process() -> bool:
    return jax.process_index() == 0


def setup_logger(log_dir: Optional[str] = None, name: str = "stswincl",
                 all_ranks_file: bool = True) -> logging.Logger:
    """Rank-aware logger: stdout on process 0, per-process log files."""
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    logger.propagate = False
    fmt = logging.Formatter(
        "[%(asctime)s %(name)s] %(levelname)s: %(message)s", "%H:%M:%S")
    if is_main_process():
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(fmt)
        logger.addHandler(h)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        suffix = "" if is_main_process() else f".rank{jax.process_index()}"
        fh = logging.FileHandler(os.path.join(log_dir, f"log.txt{suffix}"))
        fh.setFormatter(fmt)
        if is_main_process() or all_ranks_file:
            logger.addHandler(fh)
    return logger


class AverageMeter:
    """Running average (`contrast/util.py:7-27`)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class MetricLogger:
    """Scalar sink: JSONL always; TensorBoard events when TF is present.

    Only process 0 writes (`summary.py:44-48` rank gating).
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self.enabled = is_main_process()
        self._tb = None
        if self.enabled:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            try:
                import tensorflow as tf  # noqa: F401  (baked in; optional)
                self._tb = tf.summary.create_file_writer(log_dir)
            except Exception:
                self._tb = None
        else:
            self._jsonl = None

    def log(self, step: int, scalars: Dict[str, float]):
        if not self.enabled:
            return
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(k, float(v), step=int(step))

    def close(self):
        if self._jsonl:
            self._jsonl.close()
