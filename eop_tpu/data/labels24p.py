"""24-point label generation: ray-cast COCO instance masks into
[cls, cx, cy, 24×(x, y)] rows.

Parity target: `Polygon_24`
(`/root/reference/yolox_24p/datasets/2+24_labels_create.py`): for every
non-crowd annotation with area ≥ 1, render its mask, cast 24 rays from the
bbox centre at 15° steps, take the first non-mask pixel along each ray as
the boundary point, reject labels whose 24-point convex-hull area falls
outside [0.5, 1.5]× the annotated area, and save normalized "Cord"
(51-col) or "Radius" (27-col) rows to one txt per image.

The reference materializes a padded template the size of
``image + 2×diagonal`` per ray (24 allocations of ~100 MPix for a large
COCO image).  ``ray_cast_24`` reproduces its numeric quirks — 0.2-px ray
steps int16-truncated, complex-number de-dup, the 1-px window offset from
the ``max_line-1`` crop (`2+24_labels_create.py:101`), nearest-survivor
selection — directly on ray coordinates, with no template allocation.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Tuple

import cv2
import numpy as np

from .coco_api import COCO

# COCO category id -> contiguous 0-79 training id (ref `:36-51`).  The
# published 2017 category ids are 1..90 with ten gaps (categories removed
# before release); the contiguous id is the rank among the survivors.
_RETIRED_COCO_IDS = {12, 26, 29, 30, 45, 66, 68, 69, 71, 83}
COCO_ID2IDX = {
    cid: idx
    for idx, cid in enumerate(
        c for c in range(1, 91) if c not in _RETIRED_COCO_IDS
    )
}


def ray_cast_24(center_x: float, center_y: float,
                mask: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """24 boundary points + radii by ray casting (ref `rotation_for_24p`).

    Returns (cord_results [24, 2] int, radius_results [24] float) with the
    reference's exact pixel semantics.
    """
    img_h, img_w = mask.shape[:2]
    max_line = int(np.hypot(img_h, img_w))
    steps = np.arange(0, max_line, 0.2)
    base = np.stack([steps, np.zeros_like(steps)])  # [2, L]

    cords, radii = [], []
    for rot_time in range(24):
        theta = rot_time * 15 * np.pi / 180
        m_rot = np.array(
            [[np.cos(theta), -np.sin(theta)],
             [np.sin(theta), np.cos(theta)]]
        )
        pts = (m_rot @ base).astype(np.int16)  # truncation, like the ref
        uniq = pts[0, :] + pts[1, :] * 1j
        _, idx = np.unique(uniq, return_index=True)
        pts = pts[:, idx]
        # The reference assigns `pts + center + max_line` back into the
        # int16 array (truncating cast on a positive value = floor); the
        # integer max_line offset never changes the fractional part, so
        # floor(pts + center) reproduces the indexed pixel exactly.
        xi = np.floor(pts[0, :] + center_x).astype(np.int64)
        yi = np.floor(pts[1, :] + center_y).astype(np.int64)

        # survives = inside the (img + 1px border) window AND not on mask
        in_window = (
            (xi >= -1) & (xi <= img_w) & (yi >= -1) & (yi <= img_h)
        )
        on_mask = np.zeros_like(in_window)
        inside = (xi >= 0) & (xi < img_w) & (yi >= 0) & (yi < img_h)
        on_mask[inside] = mask[yi[inside], xi[inside]] != 0
        alive = in_window & ~on_mask
        if not alive.any():
            # degenerate: mask covers the whole window ring; fall back to
            # the centre itself
            cords.append(np.array([int(center_x), int(center_y)]))
            radii.append(0.0)
            continue

        # window coords carry the reference's +1 offset (crop starts at
        # max_line - 1)
        wx = xi[alive] + 1
        wy = yi[alive] + 1
        dist = np.sqrt((wx - center_x) ** 2 + (wy - center_y) ** 2)
        k = int(np.argmin(dist))
        cords.append(
            np.array(
                [np.clip(wx[k], 0, img_w), np.clip(wy[k], 0, img_h)]
            )
        )
        radii.append(float(dist[k]))
    return np.array(cords), np.array(radii)


class Polygon24:
    """Batch label generator (ref `Polygon_24`)."""

    def __init__(self, json_label_path: str, image_data_path: str,
                 output_path: str, mode: str = "Cord"):
        assert mode in ("Cord", "Radius")
        self.mode = mode
        self.json_label_pth = json_label_path
        self.image_data_pth = image_data_path
        self.new_label_pth = output_path
        self.coco = COCO(json_label_path)
        self.label_dict_cord24: Dict[str, list] = {}
        self.label_dict_radius: Dict[str, list] = {}

    def process(self, area_t_low=0.5, area_t_high=1.5, progress=False):
        """Ray-cast every usable annotation (ref `json_anno_process`)."""
        anno_info = self.coco.dataset.get("annotations", [])
        iterator = anno_info
        if progress:
            from tqdm import tqdm

            iterator = tqdm(anno_info)
        # image sizes come from the index; imread only once per image
        img_cache = {}
        for anno in iterator:
            name = str(anno["image_id"]).zfill(12)
            self.label_dict_cord24.setdefault(name, [])
            self.label_dict_radius.setdefault(name, [])
            if anno.get("iscrowd", 0):
                continue
            label_area = anno["area"]
            if label_area < 1:
                continue
            label_id = np.array(
                [COCO_ID2IDX[int(anno["category_id"])]]
            )
            image_pth = Path(self.image_data_pth) / f"{name}.jpg"
            if name in img_cache:
                img_h, img_w = img_cache[name]
            elif os.path.exists(image_pth):
                # sizes straight from the COCO index — decoding every
                # JPEG just for im.shape costs hours on train2017
                info = self.coco.imgs[anno["image_id"]]
                img_h, img_w = int(info["height"]), int(info["width"])
                img_cache[name] = (img_h, img_w)
            else:
                continue
            img_diag = np.hypot(img_h, img_w)
            bbox = np.asarray(anno["bbox"], dtype=np.float64)
            obj_x, obj_y = bbox[:2] + bbox[2:4] / 2
            cur_mask = self.coco.annToMask(anno)
            cur_24p, cur_24r = ray_cast_24(obj_x, obj_y, cur_mask)
            cur_24r = cur_24r / img_diag
            hull = cv2.convexHull(cur_24p.astype(np.int32))
            hull_area = cv2.contourArea(hull)
            if (
                hull_area <= label_area * area_t_low
                or hull_area >= label_area * area_t_high
            ):
                continue
            obj_cord = np.array([obj_x / img_w, obj_y / img_h])
            flat = cur_24p.reshape(-1).astype(np.float32)
            flat[0::2] = flat[0::2] / img_w
            flat[1::2] = flat[1::2] / img_h
            self.label_dict_cord24[name].append(
                np.concatenate((label_id, obj_cord, flat))
            )
            self.label_dict_radius[name].append(
                np.concatenate((label_id, obj_cord, cur_24r))
            )
        return self.label_dict_cord24, self.label_dict_radius

    def save(self):
        """One txt per image (ref `save_24r_to_txt:214-236`)."""
        os.makedirs(self.new_label_pth, exist_ok=True)
        if self.mode == "Cord":
            label_dict = self.label_dict_cord24
            fmt = ["%d"] + ["%0.4f"] * 50
        else:
            label_dict = self.label_dict_radius
            fmt = ["%d"] + ["%0.4f"] * 26
        for name, rows in label_dict.items():
            txt_pth = Path(self.new_label_pth) / f"{name}.txt"
            arr = np.array(rows)
            if arr.shape[0]:
                np.savetxt(str(txt_pth), arr, fmt=fmt)
            else:
                np.savetxt(str(txt_pth), arr)
