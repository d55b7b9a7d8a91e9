"""Batched YOLOX training loss (bbox head), fully static, vmapped SimOTA.

Parity target: `YOLOXHead.get_losses`
(`/root/reference/yolox/models/yolo_head.py:253-415`):
``loss = 5·IoU + obj + cls (+ L1 when enabled)``, every term summed over
foreground anchors and normalized by the batch-total ``num_fg``.

The reference's per-image Python loop + boolean-index gathers become a
``jax.vmap`` over the SimOTA assignment and masked sums over the padded
[B, A] lattice — bitwise the same sums, zero dynamic shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .iou_loss import bce_with_logits, iou_loss
from .simota import (
    Assignment,
    SimOTAConfig,
    gather_anchor_geometry,
    gather_foreground,
    simota_assign,
)


class YoloxLossConfig(NamedTuple):
    num_classes: int = 80
    reg_weight: float = 5.0
    use_l1: bool = False
    simota: SimOTAConfig = SimOTAConfig()


class YoloxLossAux(NamedTuple):
    loss_iou: jnp.ndarray
    loss_obj: jnp.ndarray
    loss_cls: jnp.ndarray
    loss_l1: jnp.ndarray
    num_fg_per_gt: jnp.ndarray  # ref "proportion" metric num_fg / num_gts
    # candidate anchors shed by capacity compaction (0 = bit-exact)
    cand_dropped: jnp.ndarray = None


def _l1_target(gt_boxes, grids, strides, eps=1e-8):
    """Per-anchor L1 regression target (ref `get_l1_target:417-422`)."""
    tx = gt_boxes[..., 0] / strides - grids[..., 0]
    ty = gt_boxes[..., 1] / strides - grids[..., 1]
    tw = jnp.log(gt_boxes[..., 2] / strides + eps)
    th = jnp.log(gt_boxes[..., 3] / strides + eps)
    return jnp.stack([tx, ty, tw, th], axis=-1)


def yolox_losses(
    decoded,      # [B, A, 4+1+C] decoded reg, logit obj/cls (training path)
    origin_reg,   # [B, A, 4] raw reg predictions (L1 loss)
    labels,       # [B, M, 5] (cls, cx, cy, w, h) zero-padded
    grids,        # [A, 2]
    strides,      # [A]
    config: YoloxLossConfig,
):
    """Returns (total_loss, YoloxLossAux). All math fp32."""
    c = config.num_classes
    decoded = decoded.astype(jnp.float32)
    bbox_preds = decoded[..., :4]
    obj_logits = decoded[..., 4]
    cls_logits = decoded[..., 5:]

    # Label assignment is not differentiated (the reference runs it under
    # torch.no_grad(), `yolo_head.py:424`); stop_gradient also keeps the
    # top-k/scatter machinery out of the backward graph.
    assign: Assignment = jax.lax.stop_gradient(
        jax.vmap(
            lambda lab, bp, ol, cl: simota_assign(
                lab, bp, ol, cl, grids, strides, c, config.simota
            )
        )(labels.astype(jnp.float32), bbox_preds, obj_logits, cls_logits)
    )

    fg = assign.fg_mask                       # [B, A] bool
    fgf = fg.astype(jnp.float32)
    num_fg = jnp.maximum(jnp.sum(assign.num_fg), 1.0)
    num_gts = jnp.maximum(jnp.sum(assign.num_gt), 1.0)

    # Foreground compaction (see simota.gather_foreground)
    w_fg, fg_idx, matched, pred_iou_k = gather_foreground(
        assign, labels.shape[1], config.simota.max_k
    )
    bbox_k = jnp.take_along_axis(bbox_preds, fg_idx[..., None], axis=1)
    cls_logits_k = jnp.take_along_axis(
        cls_logits, fg_idx[..., None], axis=1
    )
    gt_boxes = jnp.take_along_axis(
        labels[..., 1:5], matched[..., None], axis=1
    )                                          # [B, K, 4]
    gt_cls = jnp.take_along_axis(labels[..., 0], matched, axis=1)

    cls_target = (
        jax.nn.one_hot(gt_cls.astype(jnp.int32), c)
        * pred_iou_k[..., None]
    )

    loss_iou = jnp.sum(iou_loss(bbox_k, gt_boxes) * w_fg) / num_fg
    loss_obj = jnp.sum(bce_with_logits(obj_logits, fgf)) / num_fg
    loss_cls = jnp.sum(
        bce_with_logits(cls_logits_k, cls_target) * w_fg[..., None]
    ) / num_fg

    if config.use_l1:
        grids_k, strides_k = gather_anchor_geometry(grids, strides, fg_idx)
        origin_k = jnp.take_along_axis(
            origin_reg.astype(jnp.float32), fg_idx[..., None], axis=1
        )
        l1_t = _l1_target(gt_boxes, grids_k, strides_k)
        loss_l1 = jnp.sum(
            jnp.abs(origin_k - l1_t) * w_fg[..., None]
        ) / num_fg
    else:
        loss_l1 = jnp.zeros(())

    total = (
        config.reg_weight * loss_iou + loss_obj + loss_cls + loss_l1
    )
    aux = YoloxLossAux(
        loss_iou=config.reg_weight * loss_iou,
        loss_obj=loss_obj,
        loss_cls=loss_cls,
        loss_l1=loss_l1,
        num_fg_per_gt=num_fg / num_gts,
        cand_dropped=jnp.sum(assign.num_dropped),
    )
    return total, aux
