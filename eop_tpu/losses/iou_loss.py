"""Elementwise losses: bbox IoU/GIoU loss and BCE-with-logits.

Parity target: `IOUloss` (`/root/reference/yolox/models/losses.py:9-53`) —
matched-pair IoU loss on [cx, cy, w, h] boxes, ``1 - iou²`` ("iou" mode) or
``1 - giou`` ("giou" mode) — and torch's ``BCEWithLogitsLoss(reduction="none")``.
Pure jnp; reductions are left to the caller (masked sums in the train step).
"""

from __future__ import annotations

import jax.numpy as jnp


def bce_with_logits(logits, targets):
    """Numerically-stable elementwise binary cross entropy on logits
    (torch `BCEWithLogitsLoss` semantics)."""
    neg_abs = -jnp.abs(logits)
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(neg_abs))
    )


def _corners(boxes):
    """cxcywh [..., 4] -> (lo [..., 2], hi [..., 2])."""
    half = boxes[..., 2:4] * 0.5
    return boxes[..., :2] - half, boxes[..., :2] + half


def _box_area(corner_pair):
    lo, hi = corner_pair
    return jnp.prod(hi - lo, axis=-1)


def iou_loss(pred, target, loss_type: str = "iou"):
    """Matched-pair IoU loss on cxcywh boxes; pred/target [..., 4].

    Returns elementwise loss [...]: ``1 - iou²`` or ``1 - giou``
    (capability of ref `IOUloss.forward:15-53`).
    """
    (p_lo, p_hi), (g_lo, g_hi) = _corners(pred), _corners(target)
    overlap = (jnp.maximum(p_lo, g_lo), jnp.minimum(p_hi, g_hi))
    nonempty = jnp.all(overlap[0] < overlap[1], axis=-1).astype(pred.dtype)
    area_i = _box_area(overlap) * nonempty
    area_u = (
        jnp.prod(pred[..., 2:4], axis=-1)
        + jnp.prod(target[..., 2:4], axis=-1)
        - area_i
    )
    iou = area_i / (area_u + 1e-16)

    if loss_type == "iou":
        return 1.0 - iou**2
    if loss_type == "giou":
        hull = (jnp.minimum(p_lo, g_lo), jnp.maximum(p_hi, g_hi))
        area_c = _box_area(hull)
        giou = iou - (area_c - area_u) / jnp.clip(area_c, 1e-16)
        return 1.0 - jnp.clip(giou, -1.0, 1.0)
    raise ValueError(f"unknown loss_type {loss_type!r}")
