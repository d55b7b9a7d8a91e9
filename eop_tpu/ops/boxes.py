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
        tl = jnp.maximum(bboxes_a[:, None, :2], bboxes_b[None, :, :2])
        br = jnp.minimum(bboxes_a[:, None, 2:4], bboxes_b[None, :, 2:4])
        area_a = jnp.prod(bboxes_a[:, 2:4] - bboxes_a[:, :2], axis=1)
        area_b = jnp.prod(bboxes_b[:, 2:4] - bboxes_b[:, :2], axis=1)
    else:
        tl = jnp.maximum(
            bboxes_a[:, None, :2] - bboxes_a[:, None, 2:4] * 0.5,
            bboxes_b[None, :, :2] - bboxes_b[None, :, 2:4] * 0.5,
        )
        br = jnp.minimum(
            bboxes_a[:, None, :2] + bboxes_a[:, None, 2:4] * 0.5,
            bboxes_b[None, :, :2] + bboxes_b[None, :, 2:4] * 0.5,
        )
        area_a = jnp.prod(bboxes_a[:, 2:4], axis=1)
        area_b = jnp.prod(bboxes_b[:, 2:4], axis=1)
    en = jnp.all(tl < br, axis=2).astype(bboxes_a.dtype)
    area_i = jnp.prod(br - tl, axis=2) * en
    return area_i / (area_a[:, None] + area_b[None, :] - area_i)


def matrix_iou(a, b):
    """numpy pairwise IoU for host-side augmentation (ref `matrix_iou:102`)."""
    lt = np.maximum(a[:, np.newaxis, :2], b[:, :2])
    rb = np.minimum(a[:, np.newaxis, 2:], b[:, 2:])
    area_i = np.prod(rb - lt, axis=2) * (lt < rb).all(axis=2)
    area_a = np.prod(a[:, 2:] - a[:, :2], axis=1)
    area_b = np.prod(b[:, 2:] - b[:, :2], axis=1)
    return area_i / (area_a[:, np.newaxis] + area_b - area_i + 1e-12)


def adjust_box_anns(bbox, scale_ratio, padw, padh, w_max, h_max):
    """Scale + shift + clip annotations, numpy, host-side mosaic helper
    (ref `adjust_box_anns:112`). Mutates like the reference (numpy arrays
    owned by the data pipeline)."""
    bbox[:, 0::2] = np.clip(bbox[:, 0::2] * scale_ratio + padw, 0, w_max)
    bbox[:, 1::2] = np.clip(bbox[:, 1::2] * scale_ratio + padh, 0, h_max)
    return bbox


def filter_box(output, scale_range):
    """Keep detections whose sqrt-area lies in ``scale_range``
    (ref `filter_box:22-30`). Host-side numpy."""
    min_scale, max_scale = scale_range
    w = output[:, 2] - output[:, 0]
    h = output[:, 3] - output[:, 1]
    keep = (w * h > min_scale * min_scale) & (w * h < max_scale * max_scale)
    return output[keep]
