"""Samplers (torch-free).

Parity targets: `YoloBatchSampler` and `InfiniteSampler`
(`/root/reference/yolox/data/samplers.py:14-85`) — the mosaic on/off
tuple-index batches and the rank-strided infinite shuffled index stream.
"""

from __future__ import annotations

import itertools
from typing import Iterator, Optional

import numpy as np


class InfiniteSampler:
    """Infinite stream of shuffled indices; each rank takes
    ``indices[rank::world_size]`` (ref `InfiniteSampler:30-85`)."""

    def __init__(self, size: int, shuffle: bool = True,
                 seed: Optional[int] = 0, rank: int = 0,
                 world_size: int = 1):
        assert size > 0
        self._size = size
        self._shuffle = shuffle
        self._seed = int(seed or 0)
        self._rank = rank
        self._world_size = world_size

    def __iter__(self) -> Iterator[int]:
        yield from itertools.islice(
            self._infinite_indices(), self._rank, None, self._world_size
        )

    def _infinite_indices(self):
        rng = np.random.default_rng(self._seed)
        while True:
            if self._shuffle:
                yield from rng.permutation(self._size).tolist()
            else:
                yield from range(self._size)

    def __len__(self):
        return self._size // self._world_size


class SequentialSampler:
    def __init__(self, size: int):
        self._size = size

    def __iter__(self):
        return iter(range(self._size))

    def __len__(self):
        return self._size


class RandomSampler:
    def __init__(self, size: int, seed: Optional[int] = None):
        self._size = size
        self._rng = np.random.default_rng(seed)

    def __iter__(self):
        return iter(self._rng.permutation(self._size).tolist())

    def __len__(self):
        return self._size


class BatchSampler:
    """Groups sampler indices into batches."""

    def __init__(self, sampler, batch_size: int, drop_last: bool):
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last

    def __iter__(self):
        batch = []
        for idx in self.sampler:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __len__(self):
        n = len(self.sampler)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size


class YoloBatchSampler(BatchSampler):
    """Batches of ``(mosaic, index)`` tuples; flipping ``.mosaic`` turns the
    mosaic augmentation off mid-training (ref `YoloBatchSampler:14-27`)."""

    def __init__(self, *args, mosaic: bool = True, input_dimension=None,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.mosaic = mosaic
        self.input_dimension = input_dimension

    def __iter__(self):
        for batch in super().__iter__():
            yield [(self.mosaic, idx) for idx in batch]
