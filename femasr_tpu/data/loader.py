"""Threaded prefetching data loader feeding NHWC numpy batches to the device.

Capability parity with the reference's dataloader stack
(/root/reference/basicsr/data/__init__.py:40-94 build_dataloader,
prefetch_dataloader.py:7-125 PrefetchGenerator/CPUPrefetcher/CUDAPrefetcher),
without torch: worker threads map dataset.__getitem__ (cv2/numpy release the
GIL for the heavy parts), a bounded queue provides prefetch, and batches are
stacked into pinned-free numpy NHWC arrays ready for jax.device_put. The
CUDAPrefetcher's copy-overlap role is covered by double-buffered
device_put in the trainer.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np

from ..utils.registry import DATASET_REGISTRY


def build_dataset(dataset_opt: dict):
    """Instantiate a dataset from its YAML opt (reference data/__init__.py:25)."""
    dataset_opt = dict(dataset_opt)
    dataset = DATASET_REGISTRY.get(dataset_opt['type'])(dataset_opt)
    return dataset


def default_collate(samples: List[Dict]) -> Dict[str, Any]:
    """Stack dict-of-array samples into a dict of (N, H, W, C) batches."""
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals, axis=0)
        else:
            out[key] = vals
    return out


class DataLoader:
    """Iteration-oriented loader: sampler -> worker threads -> batch queue."""

    def __init__(self, dataset, batch_size: int = 1, sampler=None,
                 shuffle: bool = False, num_workers: int = 0,
                 drop_last: bool = False, prefetch_queue: int = 4,
                 collate_fn: Callable = default_collate,
                 seed: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.drop_last = drop_last
        self.prefetch_queue = prefetch_queue
        self.collate_fn = collate_fn
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        if self.sampler is not None and hasattr(self.sampler, 'set_epoch'):
            self.sampler.set_epoch(epoch)

    def _indices(self) -> List[int]:
        if self.sampler is not None:
            return list(iter(self.sampler))
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(
                None if self.seed is None else self.seed + self._epoch)
            rng.shuffle(idx)
        return idx.tolist()

    def __len__(self) -> int:
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        indices = self._indices()
        if self.drop_last:
            indices = indices[:len(indices) - len(indices) % self.batch_size]
        batches = [indices[i:i + self.batch_size]
                   for i in range(0, len(indices), self.batch_size)]

        if self.num_workers == 0:
            for batch_idx in batches:
                yield self.collate_fn([self.dataset[i] for i in batch_idx])
            return

        out_q: 'queue.Queue' = queue.Queue(maxsize=self.prefetch_queue)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # never block forever on a full queue: an abandoned consumer
            # sets `stop` from the finally below, and the producer must
            # notice even mid-put (else the daemon thread pins the dataset
            # and prefetched batches for the process lifetime)
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                import concurrent.futures as cf
                with cf.ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.dataset.__getitem__,
                                                batch_idx))
                        if not put_or_stop(self.collate_fn(samples)):
                            return
            except Exception as e:  # surface worker errors to the consumer
                put_or_stop(e)
            finally:
                put_or_stop(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


class DevicePrefetcher:
    """Wrap a loader to pre-stage the NEXT batch on device while the current
    step runs (the CUDAPrefetcher analogue, prefetch_dataloader.py:79-125;
    host->device copies overlap with async-dispatched jit steps)."""

    def __init__(self, loader: 'DataLoader', put_fn):
        self.loader = loader
        self.put_fn = put_fn  # e.g. parallel.mesh.make_global_batch partial

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        it = iter(self.loader)
        nxt = next(it, None)
        nxt = self.put_fn(nxt) if nxt is not None else None
        while nxt is not None:
            cur = nxt
            host_next = next(it, None)
            nxt = self.put_fn(host_next) if host_next is not None else None
            yield cur


def build_dataloader(dataset, dataset_opt: dict, num_gpu: int = 1,
                     dist: bool = False, sampler=None, seed=None) -> DataLoader:
    """Create a train/val/test loader from YAML opts (data/__init__.py:40-94).

    `num_gpu` scales the per-step batch like the reference's per-GPU batch
    (batch_size_per_gpu * num_devices is the global batch fed to pjit).
    """
    phase = dataset_opt['phase']
    if phase == 'train':
        # per-PROCESS batch: each host contributes its shard of the global
        # batch (batch_size_per_gpu * num_gpu) — make_global_batch assembles
        # the shards with make_array_from_process_local_data, so sizing by
        # the global device count here would inflate the global batch
        # process_count-fold on multi-host
        import jax
        local_devices = max(num_gpu, 1) // max(jax.process_count(), 1)
        batch_size = (dataset_opt.get('batch_size_per_gpu', 1)
                      * max(local_devices, 1))
        num_workers = dataset_opt.get('num_worker_per_gpu', 4)
        return DataLoader(dataset, batch_size=batch_size, sampler=sampler,
                          shuffle=sampler is None
                          and dataset_opt.get('use_shuffle', True),
                          num_workers=num_workers, drop_last=True,
                          prefetch_queue=dataset_opt.get('num_prefetch_queue',
                                                         4),
                          seed=seed)
    if phase in ('val', 'test'):
        return DataLoader(dataset, batch_size=1, shuffle=False, num_workers=0)
    raise ValueError(f'Wrong dataset phase: {phase}. '
                     "Supported ones are 'train', 'val' and 'test'.")
