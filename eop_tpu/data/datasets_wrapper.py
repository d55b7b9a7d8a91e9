"""Dataset base classes (torch-free).

Parity target: `/root/reference/yolox/data/datasets/datasets_wrapper.py` —
a `Dataset` base with a dynamic ``input_dim`` (single source of truth for
multiscale), the ``mosaic_getitem`` decorator implementing the
``(mosaic, index)`` tuple-index protocol, and Concat/MixConcat datasets.
The reference builds on torch.utils.data; this framework's loader is its
own (see `dataloading.py`), so the base classes are plain Python.
"""

from __future__ import annotations

import bisect
from functools import wraps
from typing import Sequence


class Dataset:
    """Base dataset with on-the-fly ``input_dim`` resizing support."""

    def __init__(self, input_dimension, mosaic: bool = True):
        self.__input_dim = tuple(input_dimension[:2])
        self.enable_mosaic = mosaic

    @property
    def input_dim(self):
        if hasattr(self, "_input_dim"):
            return self._input_dim
        return self.__input_dim

    def __len__(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def __getitem__(self, index):  # pragma: no cover - abstract
        raise NotImplementedError

    @staticmethod
    def mosaic_getitem(getitem_fn):
        """Route ``(mosaic, index)`` tuple indices: set the flag, unwrap."""

        @wraps(getitem_fn)
        def wrapper(self, index):
            if not isinstance(index, int):
                self.enable_mosaic = index[0]
                index = index[1]
            return getitem_fn(self, index)

        return wrapper


def _cumulative_sizes(datasets: Sequence) -> list:
    out, s = [], 0
    for d in datasets:
        s += len(d)
        out.append(s)
    return out


class ConcatDataset(Dataset):
    """Concatenation with ``pull_item`` passthrough (ref `ConcatDataset`)."""

    def __init__(self, datasets: Sequence):
        assert datasets, "datasets should not be empty"
        self.datasets = list(datasets)
        self.cumulative_sizes = _cumulative_sizes(self.datasets)
        if hasattr(self.datasets[0], "input_dim"):
            self._input_dim = self.datasets[0].input_dim
        super().__init__(getattr(self.datasets[0], "input_dim", (416, 416)))

    def __len__(self):
        return self.cumulative_sizes[-1]

    def _locate(self, idx: int):
        if idx < 0:
            if -idx > len(self):
                raise ValueError(
                    "absolute value of index should not exceed dataset length"
                )
            idx = len(self) + idx
        di = bisect.bisect_right(self.cumulative_sizes, idx)
        si = idx if di == 0 else idx - self.cumulative_sizes[di - 1]
        return di, si

    def __getitem__(self, idx):
        di, si = self._locate(idx)
        return self.datasets[di][si]

    def pull_item(self, idx):
        di, si = self._locate(idx)
        return self.datasets[di].pull_item(si)


class MixConcatDataset(ConcatDataset):
    """Concat supporting the tuple-index protocol (ref `MixConcatDataset`)."""

    def __getitem__(self, index):
        if isinstance(index, int):
            di, si = self._locate(index)
            return self.datasets[di][si]
        di, si = self._locate(index[1])
        return self.datasets[di][(index[0], si, *index[2:])]
