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


def iou_loss(pred, target, loss_type: str = "iou"):
    """Matched-pair IoU loss on cxcywh boxes; pred/target [..., 4].

    Returns elementwise loss [...] (ref `IOUloss.forward:15-53`).
    """
    tl = jnp.maximum(
        pred[..., :2] - pred[..., 2:4] * 0.5,
        target[..., :2] - target[..., 2:4] * 0.5,
    )
    br = jnp.minimum(
        pred[..., :2] + pred[..., 2:4] * 0.5,
        target[..., :2] + target[..., 2:4] * 0.5,
    )
    area_p = jnp.prod(pred[..., 2:4], axis=-1)
    area_g = jnp.prod(target[..., 2:4], axis=-1)
    en = jnp.all(tl < br, axis=-1).astype(pred.dtype)
    area_i = jnp.prod(br - tl, axis=-1) * en
    area_u = area_p + area_g - area_i
    iou = area_i / (area_u + 1e-16)

    if loss_type == "iou":
        return 1.0 - iou**2
    if loss_type == "giou":
        c_tl = jnp.minimum(
            pred[..., :2] - pred[..., 2:4] * 0.5,
            target[..., :2] - target[..., 2:4] * 0.5,
        )
        c_br = jnp.maximum(
            pred[..., :2] + pred[..., 2:4] * 0.5,
            target[..., :2] + target[..., 2:4] * 0.5,
        )
        area_c = jnp.prod(c_br - c_tl, axis=-1)
        giou = iou - (area_c - area_u) / jnp.clip(area_c, 1e-16)
        return 1.0 - jnp.clip(giou, -1.0, 1.0)
    raise ValueError(f"unknown loss_type {loss_type!r}")
