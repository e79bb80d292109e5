"""Deterministic distributed sampling.

Parity: /root/reference/basicsr/data/data_sampler.py (EnlargedSampler:6-48):
dataset-enlarge ratio for iteration-based training, epoch-seeded random
permutation, modulo wrap, rank-strided subsampling. Host-process sharding for
multi-host TPU data parallelism (each JAX process loads its own shard).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np


class EnlargedSampler:
    """Epoch-seeded strided sampler over an (optionally enlarged) dataset."""

    def __init__(self, dataset_size: int, num_replicas: int, rank: int,
                 ratio: int = 1):
        self.dataset_size = dataset_size
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0
        self.num_samples = math.ceil(dataset_size * ratio / num_replicas)
        self.total_size = self.num_samples * num_replicas

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        rng = np.random.default_rng(self.epoch)
        indices = rng.permutation(self.total_size)
        indices = indices % self.dataset_size
        indices = indices[self.rank:self.total_size:self.num_replicas]
        return iter(indices.tolist())

    def __len__(self) -> int:
        return self.num_samples
