"""24-point dataset + transforms (txt label files).

Parity targets: `COCO24PDataset` (`/root/reference/yolox_24p/datasets/coco24p.py`)
and the 24p `TrainTransform`/`ValTransform`
(`/root/reference/yolox_24p/datasets/data_augment.py:131-207`).

Label files: one txt per image, rows of 51 floats
``[cls, cx, cy, 24×(x, y)]``, all coordinates normalized to the original
image size (the output of the label generator, `labels24p.py`).

Divergences from the reference (documented):
* data/label directories are constructor arguments, not hardcoded user
  paths (`coco24p.py:19-20`);
* the reference's ``load_image`` returns ``(h, h)`` for (h, w)
  (`coco24p.py:57`) — a bug with no downstream effect (only ``img_info``
  metadata); we return the real width.
"""

from __future__ import annotations

import os
import warnings
from pathlib import Path

import cv2
import numpy as np

from .augment import preproc
from .cached_dataset import fit_resize
from .datasets_wrapper import Dataset


class COCO24PDataset(Dataset):
    """COCO-24P dataset over per-image txt label files (ref `:11-131`).

    All label rows load into RAM at construction (they are tiny); images
    are decoded and fit-resized lazily per item, so raw image sizes are
    discovered at load time rather than pre-indexed.
    """

    def __init__(self, data_dir: str, label_dir: str, img_size=(640, 640),
                 preproc=None):
        super().__init__(img_size)
        self.data_dir = data_dir
        self.label_dir = label_dir
        self.img_size = img_size
        self.preproc = preproc
        self.imgs = None

        self.coco24p_dict = {}
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # np.loadtxt on 1-row files
            for txt in sorted(Path(label_dir).glob("*.txt")):
                self.coco24p_dict[txt.stem] = np.loadtxt(
                    txt, dtype=float, ndmin=2
                )
        self.image_list = [f"{stem}.jpg" for stem in self.coco24p_dict]

    def __len__(self):
        return len(self.image_list)

    def load_image(self, img_name: str) -> np.ndarray:
        path = os.path.join(self.data_dir, img_name)
        img = cv2.imread(path)
        assert img is not None, f"image {path} not found"
        return img

    def load_anno(self, index):
        return self.coco24p_dict[Path(self.image_list[index]).stem]

    def pull_item(self, index):
        stem = Path(self.image_list[index]).stem
        raw = self.load_image(self.image_list[index])
        img, _ = fit_resize(raw, self.img_size)
        return (
            img,
            self.coco24p_dict[stem],
            raw.shape[:2],
            np.array([int(stem)]),
        )

    @Dataset.mosaic_getitem
    def __getitem__(self, index):
        img, target, img_info, img_id = self.pull_item(index)
        if self.preproc is not None:
            img, target = self.preproc(img, target, self.img_size)
        return img, target, img_info, img_id


class TrainTransform24P:
    """De-normalize 24p coords, letterbox, pad to [max_labels, 51]
    (ref 24p `TrainTransform:131-174`).  The reference parses but never
    applies flip/HSV (`flip_prob` unused there); ditto here for parity."""

    def __init__(self, max_labels=50, flip_prob=0.5):
        self.max_labels = max_labels
        self.flip_prob = flip_prob

    def __call__(self, image, targets, input_dim):
        if targets.shape[1] == 0:
            targets = np.zeros((self.max_labels, 51), dtype=np.float32)
            image, _ = preproc(image, input_dim)
            return image, targets

        height_o, width_o, _ = image.shape
        boxes24p = targets[:, 1:].copy()
        labels24p = targets[:, 0].copy()

        # normalized -> pixel coords of the (resized) input image
        boxes24p[:, 0::2] = boxes24p[:, 0::2] * width_o
        boxes24p[:, 1::2] = boxes24p[:, 1::2] * height_o

        image_t, r = preproc(image, input_dim)
        boxes24p *= r

        targets_t = np.hstack((labels24p[:, None], boxes24p))
        padded = np.zeros((self.max_labels, 51), dtype=np.float32)
        padded[: min(len(targets_t), self.max_labels)] = targets_t[
            : self.max_labels
        ]
        return image_t, np.ascontiguousarray(padded, np.float32)


class ValTransform24P:
    """Letterbox only; also returns the un-normalized padded uint8 image
    (ref 24p `ValTransform:177-207` returns ``img_pad`` for display)."""

    def __init__(self, legacy: bool = False):
        self.legacy = legacy

    def __call__(self, img, res, input_size):
        img_f, _ = preproc(img, input_size)
        img_pad = img_f.astype(np.uint8)
        if self.legacy:
            img_f = img_f[:, :, ::-1].copy()
            img_f /= 255.0
            img_f -= np.array([0.485, 0.456, 0.406]).reshape(1, 1, 3)
            img_f /= np.array([0.229, 0.224, 0.225]).reshape(1, 1, 3)
        return img_f, np.zeros((1, 5), dtype=np.float32), img_pad
