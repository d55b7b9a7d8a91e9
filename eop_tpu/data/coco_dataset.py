"""COCO detection dataset (torch-free, own COCO API).

Capability parity with `/root/reference/yolox/data/datasets/coco.py:16-233`
(pre-scaled xyxy+cls annotations, pre-resized image loading, optional
np.memmap image cache, the ``remove_useless_info`` RAM saver), built on the
shared `ResizedDetectionDataset` base with a vectorized annotation cleaner
instead of the reference's per-object clipping loop.
"""

from __future__ import annotations

import os

import cv2
import numpy as np

from .cached_dataset import ResizedDetectionDataset
from .coco_api import COCO


def get_datadir() -> str:
    """Dataset root: $EOP_DATADIR (or $YOLOX_DATADIR) else <repo>/datasets."""
    datadir = os.getenv("EOP_DATADIR") or os.getenv("YOLOX_DATADIR")
    if datadir is None:
        import eop_tpu

        pkg_root = os.path.dirname(os.path.dirname(eop_tpu.__file__))
        datadir = os.path.join(pkg_root, "datasets")
    return datadir


def remove_useless_info(coco: COCO):
    """Drop fields the detection pipeline never reads (segmentation,
    licensing, URLs) — saves ~30% annotation RAM on full COCO."""
    payload = coco.dataset
    for key in ("info", "licenses"):
        payload.pop(key, None)
    unused_img_keys = ("license", "coco_url", "date_captured", "flickr_url")
    for img in payload.get("images", []):
        for key in unused_img_keys:
            img.pop(key, None)
    for anno in payload.get("annotations", []):
        anno.pop("segmentation", None)


class COCODataset(ResizedDetectionDataset):
    """COCO-format detection dataset."""

    def __init__(
        self,
        data_dir=None,
        json_file="instances_train2017.json",
        name="train2017",
        img_size=(416, 416),
        preproc=None,
        cache=False,
    ):
        super().__init__(img_size, preproc=preproc)
        self.data_dir = data_dir or os.path.join(get_datadir(), "COCO")
        self.json_file = json_file
        self.name = name

        self.coco = COCO(os.path.join(self.data_dir, "annotations", json_file))
        remove_useless_info(self.coco)
        self.ids = self.coco.getImgIds()
        self.class_ids = sorted(self.coco.getCatIds())
        self._label_of = {cid: i for i, cid in enumerate(self.class_ids)}
        self._classes = tuple(
            c["name"] for c in self.coco.loadCats(self.coco.getCatIds())
        )
        self.annotations = [self._build_record(i) for i in self.ids]
        if cache:
            self._cache_images()

    def _build_record(self, img_id):
        """One sample record: cleaned boxes scaled to the fit ratio."""
        meta = self.coco.loadImgs(img_id)[0]
        h, w = meta["height"], meta["width"]
        anns = [
            a
            for a in self.coco.loadAnns(
                self.coco.getAnnIds(imgIds=[int(img_id)], iscrowd=False)
            )
            if a["area"] > 0
        ]
        if anns:
            xywh = np.array([a["bbox"] for a in anns], dtype=np.float64)
            lo = np.maximum(xywh[:, :2], 0.0)
            hi = np.minimum(lo + np.maximum(xywh[:, 2:4], 0.0), (w, h))
            cls = np.array(
                [self._label_of[a["category_id"]] for a in anns],
                dtype=np.float64,
            )
            rows = np.concatenate([lo, hi, cls[:, None]], axis=1)
            rows = rows[(hi >= lo).all(axis=1)]
        else:
            rows = np.zeros((0, 5), dtype=np.float64)

        r = self.fit_ratio((h, w))
        rows[:, :4] *= r
        resized_hw = (int(h * r), int(w * r))
        file_name = meta.get("file_name", f"{img_id:012}.jpg")
        return (rows, (h, w), resized_hw, file_name)

    # legacy alias kept for external callers of the reference-shaped API
    def load_anno_from_ids(self, id_):
        return self._build_record(id_)

    def load_image(self, index):
        file_name = self.annotations[index][3]
        path = os.path.join(self.data_dir, self.name, file_name)
        img = cv2.imread(path)
        assert img is not None, f"image {path} not found"
        return img

    def _cache_path(self):
        return os.path.join(
            self.data_dir, f"img_resized_cache_{self.name}.array"
        )

    def sample_id(self, index):
        return np.array([self.ids[index]])
