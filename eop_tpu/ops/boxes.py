"""Box geometry utilities (pure jnp, functional — no in-place mutation).

Capability parity with `/root/reference/yolox/utils/boxes.py:76-129` and the
numpy helpers used by the data pipeline.  Unlike the reference (which
mutates tensors in place, a torch idiom), every function here returns a new
array — the JAX/XLA functional convention; XLA fuses these elementwise ops
for free.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def cxcywh2xyxy(boxes):
    """[cx, cy, w, h] -> [x1, y1, x2, y2]."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1
    )


def xyxy2cxcywh(boxes):
    """[x1, y1, x2, y2] -> [cx, cy, w, h] (ref `xyxy2cxcywh:124`)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    w = x2 - x1
    h = y2 - y1
    return jnp.concatenate([x1 + w * 0.5, y1 + h * 0.5, w, h], axis=-1)


def xyxy2xywh(boxes):
    """[x1, y1, x2, y2] -> [x1, y1, w, h] (ref `xyxy2xywh:118`)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def bboxes_iou(bboxes_a, bboxes_b, xyxy: bool = True):
    """Pairwise IoU matrix [Na, Nb] (ref `bboxes_iou:76-99`).

    ``xyxy=False`` treats inputs as [cx, cy, w, h].
    """
    if xyxy:
        corners_a, corners_b = bboxes_a[:, :4], bboxes_b[:, :4]
        area_a = jnp.prod(bboxes_a[:, 2:4] - bboxes_a[:, :2], axis=1)
        area_b = jnp.prod(bboxes_b[:, 2:4] - bboxes_b[:, :2], axis=1)
    else:
        half_a, half_b = bboxes_a[:, 2:4] * 0.5, bboxes_b[:, 2:4] * 0.5
        corners_a = jnp.concatenate(
            [bboxes_a[:, :2] - half_a, bboxes_a[:, :2] + half_a], axis=1
        )
        corners_b = jnp.concatenate(
            [bboxes_b[:, :2] - half_b, bboxes_b[:, :2] + half_b], axis=1
        )
        area_a = jnp.prod(bboxes_a[:, 2:4], axis=1)
        area_b = jnp.prod(bboxes_b[:, 2:4], axis=1)
    tl = jnp.maximum(corners_a[:, None, :2], corners_b[None, :, :2])
    br = jnp.minimum(corners_a[:, None, 2:], corners_b[None, :, 2:])
    en = jnp.all(tl < br, axis=2).astype(bboxes_a.dtype)
    area_i = jnp.prod(br - tl, axis=2) * en
    return area_i / (area_a[:, None] + area_b[None, :] - area_i)


def matrix_iou(a, b):
    """numpy pairwise IoU for host-side augmentation (capability of ref
    `matrix_iou:102`): [Na, 4] x [Nb, 4] xyxy -> [Na, Nb]."""
    overlap_lo = np.maximum(a[:, None, :2], b[None, :, :2])
    overlap_hi = np.minimum(a[:, None, 2:4], b[None, :, 2:4])
    side = np.clip(overlap_hi - overlap_lo, 0.0, None)
    inter = side[..., 0] * side[..., 1]

    def span(boxes):
        wh = boxes[:, 2:4] - boxes[:, :2]
        return wh[:, 0] * wh[:, 1]

    return inter / (span(a)[:, None] + span(b)[None, :] - inter + 1e-12)


def adjust_box_anns(bbox, scale_ratio, padw, padh, w_max, h_max):
    """Scale + shift + clip xyxy annotations in place — host-side mosaic
    helper (capability of ref `adjust_box_anns:112`)."""
    shift = np.asarray([padw, padh], dtype=np.float64)
    limit = np.asarray([w_max, h_max], dtype=np.float64)
    quad = bbox[:, :4].reshape(-1, 2, 2)
    bbox[:, :4] = np.clip(
        quad * scale_ratio + shift, 0.0, limit
    ).reshape(-1, 4)
    return bbox


def filter_box(output, scale_range):
    """Keep detections whose area lies inside ``scale_range``², host-side
    numpy (capability of ref `filter_box:22-30`)."""
    lo, hi = scale_range
    wh = output[:, 2:4] - output[:, 0:2]
    area = wh[:, 0] * wh[:, 1]
    return output[(area > lo * lo) & (area < hi * hi)]
