"""24-point detector evaluation: COCO AP over polygon enclosing boxes.

The reference *comments out* its 24p evaluator hooks
(`/root/reference/yolox_24p/exp/base_exp.py:50-57`,
`yolox_24p/exp/yolox_base.py:170-215`) — training runs blind.  This module
implements the missing capability: ground truth comes from the 24p txt
labels (polygon → enclosing rectangle, the same geometry the 24p NMS
uses), detections from the fixed-capacity polygon postprocess, and AP from
the framework's COCOeval.  AP50 here is the "COCO-24p AP50" metric the
driver tracks.
"""

from __future__ import annotations

import time
from typing import Callable

import os

import numpy as np

try:  # optional: header-only image-size reads (falls back to cv2 decode)
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover
    _PILImage = None


def _image_size(path: str) -> "tuple[int, int]":
    """(width, height) of an image file, without a full decode when PIL
    is available."""
    if _PILImage is not None:
        with _PILImage.open(path) as im:
            return im.size
    import cv2

    img = cv2.imread(path)
    assert img is not None, f"image {path} not found"
    return img.shape[1], img.shape[0]

from ..data.coco_api import COCO
from ..ops.polygon import COS_ANGLES, SIN_ANGLES
from .coco_eval import COCOeval
from .postprocess import Detections


def polygon_rows_to_xyxy(rows: np.ndarray) -> np.ndarray:
    """[N, >=26] rows (cx, cy, 24 radii) -> enclosing [N, 4] xyxy."""
    cx, cy = rows[:, 0], rows[:, 1]
    radii = rows[:, 2:26]
    xs = cx[:, None] + radii * COS_ANGLES
    ys = cy[:, None] + radii * SIN_ANGLES
    return np.stack(
        [xs.min(1), ys.min(1), xs.max(1), ys.max(1)], axis=1
    )


class Evaluator24P:
    """COCO-style AP for the 24p detector over its txt-label dataset."""

    def __init__(self, dataloader, img_size, confthre, nmsthre,
                 num_classes: int):
        self.dataloader = dataloader
        self.img_size = img_size
        self.confthre = confthre
        self.nmsthre = nmsthre
        self.num_classes = num_classes
        self._gt = self._build_gt()

    def _build_gt(self) -> COCO:
        """Synth a COCO index from the dataset's normalized 24p labels."""
        ds = self.dataloader.dataset
        images, annotations = [], []
        ann_id = 1
        for idx in range(len(ds)):
            img_name = ds.image_list[idx]
            key = img_name.split(".")[0]
            img_id = int(key)
            # size from the image header only — pull_item would decode +
            # resize every image once just for this metadata
            ori_w, ori_h = _image_size(os.path.join(ds.data_dir, img_name))
            images.append(
                {"id": img_id, "width": int(ori_w), "height": int(ori_h),
                 "file_name": img_name}
            )
            rows = ds.coco24p_dict[key]
            rows = rows.reshape(-1, rows.shape[-1]) if rows.size else rows
            for row in rows:
                cls = int(row[0])
                pts = row[1:].copy()
                pts[0::2] *= ori_w
                pts[1::2] *= ori_h
                xs, ys = pts[2::2], pts[3::2]  # the 24 polygon vertices
                x1, y1 = float(xs.min()), float(ys.min())
                x2, y2 = float(xs.max()), float(ys.max())
                annotations.append(
                    {
                        "id": ann_id,
                        "image_id": img_id,
                        "category_id": cls,
                        "bbox": [x1, y1, x2 - x1, y2 - y1],
                        "area": float((x2 - x1) * (y2 - y1)),
                        "iscrowd": 0,
                    }
                )
                ann_id += 1
        gt = COCO()
        gt.dataset = {
            "images": images,
            "annotations": annotations,
            "categories": [
                {"id": c, "name": str(c)}
                for c in range(self.num_classes)
            ],
        }
        gt.createIndex()
        return gt

    def evaluate(self, infer_fn: Callable, distributed: bool = False):
        """Returns (ap50_95, ap50, summary).

        ``infer_fn`` MUST be pure/idempotent — the first batch is run an
        extra time as a compile warm-up before its timed call."""
        import contextlib
        import io

        import jax

        dets_json = []
        inference_time = 0.0
        n_batches = 0
        for batch in self.dataloader:
            imgs, _, info_imgs, ids = batch
            imgs_np = np.asarray(imgs, np.float32)
            if n_batches == 0:
                # warm: keep the one-off XLA compile out of the timers
                jax.device_get(infer_fn(imgs_np))
            start = time.time()
            dets: Detections = jax.device_get(infer_fn(imgs_np))
            inference_time += time.time() - start
            n_batches += 1
            rows = np.asarray(dets.rows)
            valid = np.asarray(dets.valid)
            ids = np.asarray(ids).reshape(-1)
            img_hs, img_ws = info_imgs[0], info_imgs[1]
            for b in range(rows.shape[0]):
                ok = valid[b].astype(bool)
                r = rows[b][ok]
                if not len(r):
                    continue
                scale = min(
                    self.img_size[0] / float(img_hs[b]),
                    self.img_size[1] / float(img_ws[b]),
                )
                boxes = polygon_rows_to_xyxy(r) / scale
                scores = r[:, 26] * r[:, 27]
                for box, score, cls in zip(boxes, scores, r[:, 28]):
                    x1, y1, x2, y2 = (float(v) for v in box)
                    dets_json.append(
                        {
                            "image_id": int(ids[b]),
                            "category_id": int(cls),
                            "bbox": [x1, y1, x2 - x1, y2 - y1],
                            "score": float(score),
                        }
                    )

        info = (
            f"Average inference time: "
            f"{1000 * inference_time / max(n_batches, 1):.2f} ms/batch "
            "(NMS fused)\n"
        )
        if not dets_json:
            return 0.0, 0.0, info + "no detections\n"
        coco_dt = self._gt.loadRes(dets_json)
        e = COCOeval(self._gt, coco_dt, "bbox")
        e.evaluate()
        e.accumulate()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            e.summarize()
        return e.stats[0], e.stats[1], info + buf.getvalue()
