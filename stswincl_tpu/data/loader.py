"""Batching loader with background prefetch + synthetic datasets.

Replaces torch DataLoader/DistributedSampler (`pixcontrast_18/contrast/data/
__init__.py:11-35`) with a thread-pool loader tuned for TPU feeding:

  * deterministic order + per-sample RNG streams: sample i of epoch e is
    always augmented with `Generator(seed, e, i)` regardless of worker
    count/timing;
  * per-host sharding for multi-host data parallelism (each host loads
    `1/num_shards` of every batch — the pjit equivalent of
    DistributedSampler);
  * double-buffered prefetch so host decode overlaps device compute;
  * `drop_last` batching like the reference's training loaders.

Synthetic variants generate deterministic structured data for tests and
benches — the reference has no such capability (its smoke tests require the
real datasets on disk).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np


def _seeded_rng(seed: int, epoch: int, index: int) -> np.random.Generator:
    return np.random.default_rng(
        np.random.SeedSequence([seed, epoch, index]))


# ---- process-pool workers (use_processes=True) ----
# The dataset is shipped ONCE per worker via the pool initializer (fork
# also inherits it for free); per-task payloads are just (seed, epoch, idx).
_WORKER_DATASET = None


def _proc_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _proc_load(args):
    seed, epoch, idx = args
    return _WORKER_DATASET.get(idx, _seeded_rng(seed, epoch, idx))


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 4,
        shard_index: int = 0,
        num_shards: int = 1,
        prefetch: int = 2,
        use_processes: bool = False,
    ):
        """`use_processes` decodes/augments in a ProcessPoolExecutor instead
        of threads: PIL's decode releases the GIL but the numpy augmentation
        work doesn't, so thread workers cap near ~1 core of augment
        throughput regardless of count — processes sidestep the GIL and
        scale with host cores (measured per-sample costs and the cores-vs-
        device-demand analysis: tools/profile_loader.py). Sample order and
        per-sample RNG streams are identical either way (the RNG is derived
        from (seed, epoch, index), never from worker state)."""
        assert batch_size % num_shards == 0
        self.dataset = dataset
        self.batch_size = batch_size
        self.local_batch = batch_size // num_shards
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.prefetch = prefetch
        self.use_processes = use_processes

    def steps_per_epoch(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_order(self, epoch: int) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch])).shuffle(order)
        return order

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        """Yield batches of stacked numpy arrays for one epoch."""
        order = self._epoch_order(epoch)
        steps = self.steps_per_epoch()

        def load_one(global_pos: int) -> Dict:
            idx = int(order[global_pos])
            rng = _seeded_rng(self.seed, epoch, idx)
            return self.dataset.get(idx, rng)

        def batch_indices(step: int) -> List[int]:
            start = step * self.batch_size
            # this host's contiguous slice of the global batch
            lo = start + self.shard_index * self.local_batch
            return list(range(lo, min(lo + self.local_batch, len(order))))

        def produce(out_q: queue.Queue):
            try:
                if self.use_processes:
                    from concurrent.futures import ProcessPoolExecutor
                    with ProcessPoolExecutor(
                            self.num_workers, initializer=_proc_init,
                            initargs=(self.dataset,)) as pool:
                        for step in range(steps):
                            args = [(self.seed, epoch, int(order[p]))
                                    for p in batch_indices(step)]
                            samples = list(pool.map(_proc_load, args))
                            out_q.put(_collate(samples))
                else:
                    from concurrent.futures import ThreadPoolExecutor
                    with ThreadPoolExecutor(self.num_workers) as pool:
                        for step in range(steps):
                            samples = list(
                                pool.map(load_one, batch_indices(step)))
                            out_q.put(_collate(samples))
                out_q.put(None)
            except BaseException as e:  # surface worker errors to consumer
                out_q.put(e)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item


def _collate(samples: List[Dict]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = np.asarray(vals)
    return out


# ---------------- synthetic datasets (tests / bench) ----------------

class SyntheticSegDataset:
    """Deterministic sliding-window clips + blob labels shaped like
    EndoVis18: sample `i` is the clip of global frames [i, i+t), so
    consecutive samples overlap by t-1 frames like a real video — the
    streaming eval path (`evaluate_split(streaming=True)`) is exercisable
    on synthetic data."""

    def __init__(self, length=32, t=4, hw=(128, 192), num_classes=12):
        self.length = length
        self.t = t
        self.h, self.w = hw
        self.num_classes = num_classes

    def __len__(self):
        return self.length

    def _frame(self, k: int) -> np.ndarray:
        return np.random.default_rng(k).random(
            (self.h, self.w, 3), dtype=np.float32)

    def sliding_from(self, prev_path, path) -> bool:
        return prev_path[0] == path[0] and path[1] == prev_path[1] + 1

    def get(self, index: int, rng: Optional[np.random.Generator] = None) -> Dict:
        f = index + self.t - 1  # clip's target (last) global frame
        image = np.stack([self._frame(k) for k in range(index, index + self.t)])
        # blocky labels so losses/metrics see spatial structure
        g = np.random.default_rng(f + 100_003)
        coarse = g.integers(0, self.num_classes, size=(self.h // 16, self.w // 16))
        label = np.kron(coarse, np.ones((16, 16), dtype=np.int64)).astype(np.int32)
        return {"path": (1, f), "image": image, "label": label}


class SyntheticContrastDataset:
    """Deterministic 6-view contrastive batches at reduced resolution."""

    def __init__(self, length=16, t=4, hw=(128, 192), num_classes=12):
        self.length = length
        self.t = t
        self.h, self.w = hw
        self.num_classes = num_classes

    def __len__(self):
        return self.length

    def get(self, index: int, rng: Optional[np.random.Generator] = None) -> Dict:
        g = np.random.default_rng(index)
        clips = g.standard_normal(
            (6, self.t, self.h, self.w, 3)).astype(np.float32)
        coarse = g.integers(0, self.num_classes, size=(6, self.h // 16, self.w // 16))
        labels = np.kron(coarse, np.ones((1, 16, 16), dtype=np.int64)).astype(np.int32)
        coords = g.random((6, 4), dtype=np.float32)
        return {"clips": clips, "labels": labels, "coords": coords,
                "path": (1, index)}
