"""Spawn-picklable dataset for the worker-death regression test
(jax-free: loader workers import only this module)."""

import numpy as np

from eop_tpu.data.datasets_wrapper import Dataset


class BigDS(Dataset):
    """~8 MB items: mp.Queue writes take macroscopic time, so a
    random-time SIGKILL reliably lands mid-write."""

    def __init__(self, n=64):
        super().__init__((32, 32))
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((1024, 1024, 2), i, np.float32), i
