"""Detection visualization (bbox + 24-point polygon renderers).

Parity targets: `vis()` (`/root/reference/yolox/utils/visualize.py:11-48`)
and the 24p polygon renderer (`yolox_24p/show_24p.py:325-367`).  The class
colour table is generated deterministically from HSV space rather than
copying the reference's literal matrix — same capability (80 visually
distinct per-class colours), original data.
"""

from __future__ import annotations

import colorsys

import cv2
import numpy as np


def _make_palette(n: int = 80) -> np.ndarray:
    """n visually-distinct RGB colours in [0, 1] (golden-ratio hue walk)."""
    colors = []
    h = 0.0
    for i in range(n):
        h = (h + 0.61803398875) % 1.0
        s = 0.65 + 0.35 * ((i * 7) % 3) / 2.0
        v = 0.75 + 0.25 * ((i * 5) % 2)
        colors.append(colorsys.hsv_to_rgb(h, s, v))
    return np.asarray(colors, dtype=np.float32)


_COLORS = _make_palette(80)


def vis(img, boxes, scores, cls_ids, conf=0.5, class_names=None):
    """Draw xyxy boxes + class/score labels (ref `vis:11-48`)."""
    for i in range(len(boxes)):
        box = boxes[i]
        cls_id = int(cls_ids[i])
        score = scores[i]
        if score < conf:
            continue
        x0, y0, x1, y1 = (int(v) for v in box[:4])
        color = (_COLORS[cls_id % len(_COLORS)] * 255).astype(
            np.uint8
        ).tolist()
        name = (
            class_names[cls_id]
            if class_names is not None
            else str(cls_id)
        )
        text = f"{name}:{score * 100:.1f}%"
        txt_color = (
            (0, 0, 0)
            if np.mean(_COLORS[cls_id % len(_COLORS)]) > 0.5
            else (255, 255, 255)
        )
        font = cv2.FONT_HERSHEY_SIMPLEX
        txt_size = cv2.getTextSize(text, font, 0.4, 1)[0]
        cv2.rectangle(img, (x0, y0), (x1, y1), color, 2)
        txt_bk_color = (
            _COLORS[cls_id % len(_COLORS)] * 255 * 0.7
        ).astype(np.uint8).tolist()
        cv2.rectangle(
            img,
            (x0, y0 + 1),
            (x0 + txt_size[0] + 1, y0 + int(1.5 * txt_size[1])),
            txt_bk_color,
            -1,
        )
        cv2.putText(
            img, text, (x0, y0 + txt_size[1]), font, 0.4, txt_color,
            thickness=1,
        )
    return img


def vis_24p(img, detections, ratio=1.0, conf=0.5, class_names=None,
            draw_center=True):
    """Draw 24-point polygons from postprocess rows
    ``[x, y, r1..r24, obj, cls_conf, cls]`` (ref `show_24p.py:325-367`;
    correct cosθ decode like the reference's drawing path).

    ``ratio`` is the letterbox scale to undo (coords divided by it).
    """
    from ..ops.polygon import COS_ANGLES, SIN_ANGLES

    for det in detections:
        score = float(det[26] * det[27])
        if score < conf:
            continue
        cls_id = int(det[28])
        cx, cy = det[0] / ratio, det[1] / ratio
        radii = np.asarray(det[2:26]) / ratio
        xs = (cx + radii * COS_ANGLES).astype(np.int32)
        ys = (cy + radii * SIN_ANGLES).astype(np.int32)
        color = (_COLORS[cls_id % len(_COLORS)] * 255).astype(
            np.uint8
        ).tolist()
        pts = np.stack([xs, ys], axis=1).reshape(-1, 1, 2)
        cv2.polylines(img, [pts], isClosed=True, color=color, thickness=2)
        if draw_center:
            cv2.circle(img, (int(cx), int(cy)), 3, color, -1)
        name = (
            class_names[cls_id] if class_names is not None else str(cls_id)
        )
        text = f"{name}:{score * 100:.1f}%"
        cv2.putText(
            img, text, (int(cx), max(int(cy) - 5, 10)),
            cv2.FONT_HERSHEY_SIMPLEX, 0.4, color, 1,
        )
    return img
