"""Shared machinery for detection datasets serving fit-resized images.

Both COCO and VOC datasets in the reference duplicate the same loop: parse
annotations once, pre-scale them to the training resolution, serve images
resized by the same ratio, and optionally back the resized images with an
on-disk ``np.memmap`` cache (`/root/reference/yolox/data/datasets/coco.py:86-133`,
`voc.py:108-168` — near-identical copies).  Here that machinery lives once:
subclasses supply the annotation records and raw-image loading, the base
class owns resizing, caching, and the item protocol.
"""

from __future__ import annotations

import os
from multiprocessing.pool import ThreadPool
from typing import Any, List, Tuple

import cv2
import numpy as np

from .datasets_wrapper import Dataset

# one record per sample: (labels [N, 5+] pre-scaled, raw (h, w),
#                         resized (h, w), per-dataset metadata)
Record = Tuple[np.ndarray, Tuple[int, int], Tuple[int, int], Any]


def fit_resize(img: np.ndarray, img_size) -> Tuple[np.ndarray, float]:
    """Shrink/grow ``img`` by the largest ratio that fits ``img_size``."""
    r = min(img_size[0] / img.shape[0], img_size[1] / img.shape[1])
    resized = cv2.resize(
        img, (int(img.shape[1] * r), int(img.shape[0] * r)),
        interpolation=cv2.INTER_LINEAR,
    )
    return resized.astype(np.uint8), r


class ResizedDetectionDataset(Dataset):
    """Base for datasets whose samples are images fit-resized into
    ``img_size`` with annotations pre-scaled by the same ratio."""

    def __init__(self, img_size, preproc=None):
        super().__init__(img_size)
        self.img_size = img_size
        self.preproc = preproc
        self.annotations: List[Record] = []
        self.imgs = None  # memmap of resized images when caching is on

    # -- subclass surface ---------------------------------------------------

    def load_image(self, index: int) -> np.ndarray:
        """Raw (unresized) BGR image for a sample."""
        raise NotImplementedError

    def _cache_path(self) -> str:
        """Location of the on-disk resized-image cache."""
        raise NotImplementedError

    def sample_id(self, index: int):
        """Identifier returned as the 4th element of ``pull_item``."""
        return index

    # -- shared mechanics ---------------------------------------------------

    def __len__(self) -> int:
        return len(self.annotations)

    def fit_ratio(self, raw_hw) -> float:
        return min(self.img_size[0] / raw_hw[0], self.img_size[1] / raw_hw[1])

    def load_anno(self, index: int) -> np.ndarray:
        return self.annotations[index][0]

    def load_resized_img(self, index: int) -> np.ndarray:
        resized, _ = fit_resize(self.load_image(index), self.img_size)
        return resized

    def _cache_images(self):
        """Build (first run) and attach the memmap of resized images.

        Every slot is ``img_size``-shaped; the live region of sample ``i``
        is ``[:resized_h, :resized_w]`` from its record.
        """
        path = self._cache_path()
        shape = (len(self), *self.img_size[:2], 3)
        if not os.path.exists(path):
            store = np.memmap(path, shape=shape, dtype=np.uint8, mode="w+")
            workers = min(8, os.cpu_count() or 1)
            with ThreadPool(workers) as pool:
                for i, resized in enumerate(
                    pool.imap(self.load_resized_img, range(len(self)))
                ):
                    store[i, : resized.shape[0], : resized.shape[1]] = resized
            store.flush()
            del store
        self.imgs = np.memmap(path, shape=shape, dtype=np.uint8, mode="r+")

    def pull_item(self, index: int):
        labels, raw_hw, resized_hw, _ = self.annotations[index]
        if self.imgs is not None:
            img = self.imgs[index][: resized_hw[0], : resized_hw[1]].copy()
        else:
            img = self.load_resized_img(index)
        return img, labels.copy(), raw_hw, self.sample_id(index)

    @Dataset.mosaic_getitem
    def __getitem__(self, index: int):
        img, target, raw_hw, sid = self.pull_item(index)
        if self.preproc is not None:
            img, target = self.preproc(img, target, self.input_dim)
        return img, target, raw_hw, sid
