"""24-point detector training loss: polygon SimOTA + concentric-circle GIoU
+ DWA dynamic task weighting.  Fully static shapes, vmapped, jit-owned.

Parity target: `Loss_Function`
(`/root/reference/yolox_24p/models/losses.py:159-603`):

* label rows are ``[cls, cx, cy, 24×(x, y)]`` (51 floats, zero-padded to
  ``max_labels=50``);
* candidate anchors come from an angle-sum point-in-polygon test (replacing
  the bbox in-box test) OR the 2.5-stride center box
  (`get_in_boxes_info:497-551`);
* the SimOTA similarity is the pairwise circle-GIoU statistic
  (`yolox_24p/utils/boxes.py:166-243`; see
  ``ops.circle_iou.pairwise_circle_similarity`` for the inverted-semantics
  parity flag);
* the regression loss is a 24-vector (one circle-GIoU loss per ray,
  "24 small tasks", `losses.py:283-292`);
* DWA weighting: ratios vs the previous step's losses, clipped to [0, 2],
  softmax with T=20 over 26 terms, scaled ×26, with the previous losses
  carried as explicit state (`losses.py:311-345`) — here a ``DWAState``
  pytree threaded through the train step instead of module attributes.

Known reference quirk we *fix* by default
(``Loss24PConfig(reference_parity=True)`` replicates it): its 24p L1
target uses the absolute point coordinates instead of center-relative
radii (`losses.py:594-603`); the default uses true radii.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.circle_iou import (
    matched_circle_giou_loss,
    pairwise_circle_similarity,
)
from ..ops.polygon import pts_in_poly_from_labels, radii_from_points
from .iou_loss import bce_with_logits
from .simota import (
    BIG_COST,
    Assignment,
    SimOTAConfig,
    compact_candidates,
    gather_anchor_geometry,
    gather_foreground,
    pairwise_cls_cost,
    scatter_assignment,
    simota_match,
)


class Loss24PConfig(NamedTuple):
    num_classes: int = 80
    use_l1: bool = False
    dwa_temperature: float = 20.0
    reference_parity: bool = False  # replicate the GIoU-as-IoU SimOTA stat
    simota: SimOTAConfig = SimOTAConfig()


class DWAState(NamedTuple):
    """Previous-step losses for DWA (ref `last_*_loss`, losses.py:170-172)."""

    last_iou: jnp.ndarray  # [24]
    last_obj: jnp.ndarray  # scalar
    last_cls: jnp.ndarray  # scalar

    @classmethod
    def init(cls) -> "DWAState":
        return cls(
            last_iou=jnp.ones((24,), jnp.float32),
            last_obj=jnp.ones((), jnp.float32),
            last_cls=jnp.ones((), jnp.float32),
        )


class Loss24PAux(NamedTuple):
    loss_iou: jnp.ndarray       # [24] weighted per-ray losses
    loss_obj: jnp.ndarray
    loss_cls: jnp.ndarray
    loss_l1: jnp.ndarray
    num_fg_per_gt: jnp.ndarray
    reg_w: jnp.ndarray          # [24] DWA weights
    obj_w: jnp.ndarray
    cls_w: jnp.ndarray
    # total candidate anchors shed by capacity compaction this step
    # (0 ⇒ assignment bit-exact vs the full lattice)
    cand_dropped: jnp.ndarray = None


def simota_assign_24p(
    labels_xy,    # [M, 50] rows (cx, cy, 24×(x, y)) — labels[:, 1:]
    gt_classes,   # [M]
    gt_valid,     # [M] bool
    poly_preds,   # [A, 26] decoded (cx, cy, 24 radii)
    obj_logits,   # [A]
    cls_logits,   # [A, C]
    grids,        # [A, 2]
    strides,      # [A]
    config: Loss24PConfig,
) -> Assignment:
    """Per-image polygon SimOTA (ref `get_assignments:359-442`)."""
    x_c = (grids[:, 0] + 0.5) * strides
    y_c = (grids[:, 1] + 0.5) * strides

    gt_centers = labels_xy[:, 0:2]
    gt_radii = radii_from_points(labels_xy)

    def in_centers_of(xq, yq, rq):
        cx, cy = labels_xy[:, 0], labels_xy[:, 1]
        return (
            (xq[None, :] > cx[:, None] - rq[None, :])
            & (xq[None, :] < cx[:, None] + rq[None, :])
            & (yq[None, :] > cy[:, None] - rq[None, :])
            & (yq[None, :] < cy[:, None] + rq[None, :])
            & gt_valid[:, None]
        )

    def exact_masks_and_sim(xq, yq, rq, preds):
        """The reference's three per-pair stages on a given anchor set."""
        in_poly = (
            pts_in_poly_from_labels(labels_xy, xq, yq) & gt_valid[:, None]
        )
        in_centers = in_centers_of(xq, yq, rq)
        pair_sim = pairwise_circle_similarity(
            gt_centers, gt_radii, preds[:, 0:2], preds[:, 2:26],
            reference_parity=config.reference_parity,
        )
        return in_poly, in_centers, pair_sim

    a = poly_preds.shape[0]
    r = config.simota.center_radius * strides
    cap = config.simota.cand_cap
    if cap and cap < a:
        # Static-K candidate compaction (the reference's dynamic
        # ``preds[fg_mask]`` gather, `losses.py:444-455`, made static).
        # The exact candidate test — angle-sum point-in-polygon — is itself
        # the expensive O(M·A·24) atan2 stage, so compaction keys off a
        # cheap provable superset: candidates ⊆ padded-AABB ∪ centre box.
        # The 350° angle-sum threshold (`losses.py:586-588`) admits points
        # *outside* the polygon too (for spiky star shapes, far outside).
        # Rigorous cover: an edge of length L subtends < L/d rad from any
        # point at distance ≥ d, so the angle sum σ ≤ perimeter/d; σ ≥ 350°
        # therefore forces d ≤ perimeter/6.108 — pad the AABB by exactly
        # that (+2 px fp slop).  Fuzz-verified in tests/test_simota.py.
        px, py = labels_xy[:, 2::2], labels_xy[:, 3::2]
        bx0, bx1 = jnp.min(px, 1), jnp.max(px, 1)
        by0, by1 = jnp.min(py, 1), jnp.max(py, 1)
        ex = jnp.roll(px, -1, axis=1) - px
        ey = jnp.roll(py, -1, axis=1) - py
        perimeter = jnp.sum(jnp.sqrt(ex * ex + ey * ey), axis=1)
        pad = perimeter / (350.0 * jnp.pi / 180.0) + 2.0
        in_bbox = (
            (x_c[None, :] >= (bx0 - pad)[:, None])
            & (x_c[None, :] <= (bx1 + pad)[:, None])
            & (y_c[None, :] >= (by0 - pad)[:, None])
            & (y_c[None, :] <= (by1 + pad)[:, None])
            & gt_valid[:, None]
        )
        # Centre-box anchors rank first (SimOTA's 100000 non-in_both
        # penalty means matches come from them), so capacity overflow
        # sheds only the padded-AABB tail.
        score = 2 * jnp.any(
            in_centers_of(x_c, y_c, r), axis=0
        ).astype(jnp.int32) + jnp.any(in_bbox, axis=0).astype(jnp.int32)
        idx, valid, num_dropped = compact_candidates(score, cap)
        in_poly, in_centers, pair_sim = exact_masks_and_sim(
            x_c[idx], y_c[idx], r[idx], poly_preds[idx]
        )
        in_poly &= valid[None, :]
        in_centers &= valid[None, :]
        fg_candidate = (
            jnp.any(in_poly, axis=0) | jnp.any(in_centers, axis=0)
        )
        fg_k, matched_k, pred_iou_k, num_fg = _match_core_24p(
            pair_sim, in_poly, in_centers,
            jnp.broadcast_to(fg_candidate[None, :], pair_sim.shape),
            obj_logits[idx], cls_logits[idx], gt_classes, gt_valid, config,
        )
        fg_mask, matched_gt, pred_iou = scatter_assignment(
            idx, valid, a, fg_k, matched_k, pred_iou_k
        )
        return Assignment(
            fg_mask=fg_mask,
            matched_gt=matched_gt,
            pred_iou=pred_iou,
            num_fg=num_fg,
            num_gt=jnp.sum(gt_valid).astype(jnp.float32),
            num_dropped=num_dropped,
        )

    in_poly, in_centers, pair_sim = exact_masks_and_sim(
        x_c, y_c, r, poly_preds
    )
    fg_candidate = jnp.any(in_poly, axis=0) | jnp.any(in_centers, axis=0)
    return _match_24p(
        pair_sim, in_poly, in_centers,
        jnp.broadcast_to(fg_candidate[None, :], pair_sim.shape),
        obj_logits, cls_logits, gt_classes, gt_valid, config,
    )


def _match_core_24p(
    pair_sim, in_poly, in_centers, is_candidate,
    obj_logits, cls_logits, gt_classes, gt_valid, config,
):
    """Cost assembly + dynamic-k match over whatever anchor axis the
    inputs carry (full lattice or compacted candidates)."""
    in_both = in_poly & in_centers
    pair_sim = jnp.where(gt_valid[:, None], pair_sim, 0.0)
    sim_cost = -jnp.log(pair_sim + 1e-8)
    cls_cost = pairwise_cls_cost(
        cls_logits, obj_logits, gt_classes, config.num_classes
    )
    cost = (
        cls_cost
        + config.simota.iou_weight * sim_cost
        + 100000.0 * (~in_both)
        + BIG_COST * (~is_candidate)
        + BIG_COST * (~gt_valid)[:, None]
    )
    _, fg_mask, matched_gt, pred_iou, num_fg = simota_match(
        cost, pair_sim, is_candidate, gt_valid, config.simota.max_k
    )
    return fg_mask, matched_gt, pred_iou, num_fg


def _match_24p(
    pair_sim, in_poly, in_centers, is_candidate,
    obj_logits, cls_logits, gt_classes, gt_valid, config,
):
    fg_mask, matched_gt, pred_iou, num_fg = _match_core_24p(
        pair_sim, in_poly, in_centers, is_candidate,
        obj_logits, cls_logits, gt_classes, gt_valid, config,
    )
    return Assignment(
        fg_mask=fg_mask,
        matched_gt=matched_gt,
        pred_iou=pred_iou,
        num_fg=num_fg,
        num_gt=jnp.sum(gt_valid).astype(jnp.float32),
        num_dropped=jnp.zeros((), jnp.int32),
    )


def loss_24p(
    decoded,      # [B, A, 26+1+C]: decoded (cx, cy, radii), logit obj/cls
    origin_reg,   # [B, A, 26] raw reg preds (L1)
    labels,       # [B, M, 51] (cls, cx, cy, 24×(x, y)) zero-padded
    grids,        # [A, 2]
    strides,      # [A]
    dwa: DWAState,
    config: Loss24PConfig,
):
    """Returns (total_loss, Loss24PAux, new DWAState).

    Mirrors `Loss_Function.forward` (`losses.py:175-357`).
    """
    decoded = decoded.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    poly_preds = decoded[..., :26]
    obj_logits = decoded[..., 26]
    cls_logits = decoded[..., 27:]

    gt_valid = jnp.sum(labels, axis=2) > 0  # [B, M]
    labels_xy = labels[..., 1:]
    gt_classes = labels[..., 0]

    # Assignment runs without gradients (ref `get_assignments` is
    # @torch.no_grad, losses.py:359).
    assign: Assignment = jax.lax.stop_gradient(
        jax.vmap(
            lambda lxy, gc, gv, pp, ol, cl: simota_assign_24p(
                lxy, gc, gv, pp, ol, cl, grids, strides, config
            )
        )(labels_xy, gt_classes, gt_valid, poly_preds, obj_logits,
          cls_logits)
    )

    fg = assign.fg_mask
    fgf = fg.astype(jnp.float32)
    num_fg = jnp.maximum(jnp.sum(assign.num_fg), 1.0)
    num_gts = jnp.maximum(jnp.sum(assign.num_gt), 1.0)

    # Foreground compaction (~17x less matched-loss work at A=8400; see
    # simota.gather_foreground)
    w_fg, fg_idx, matched, pred_iou_k = gather_foreground(
        assign, labels.shape[1], config.simota.max_k
    )
    poly_k = jnp.take_along_axis(
        poly_preds, fg_idx[..., None], axis=1
    )                                                 # [B, K, 26]
    gt_rows = jnp.take_along_axis(labels_xy, matched[..., None], axis=1)
    gt_cls = jnp.take_along_axis(gt_classes, matched, axis=1)

    # --- per-ray circle-GIoU loss ("24 small tasks") ---
    gt_centers = gt_rows[..., 0:2]
    gt_radii = radii_from_points(gt_rows)
    per_ray = matched_circle_giou_loss(
        gt_centers.reshape(-1, 2),
        gt_radii.reshape(-1, 24),
        poly_k[..., 0:2].reshape(-1, 2),
        poly_k[..., 2:26].reshape(-1, 24),
    ).reshape(w_fg.shape + (24,))
    loss_iou = jnp.sum(per_ray * w_fg[..., None], axis=(0, 1)) / num_fg

    loss_obj = jnp.sum(bce_with_logits(obj_logits, fgf)) / num_fg
    cls_logits_k = jnp.take_along_axis(cls_logits, fg_idx[..., None], axis=1)
    cls_target = (
        jax.nn.one_hot(gt_cls.astype(jnp.int32), config.num_classes)
        * pred_iou_k[..., None]
    )
    loss_cls = jnp.sum(
        bce_with_logits(cls_logits_k, cls_target) * w_fg[..., None]
    ) / num_fg

    if config.use_l1:
        grids_k, strides_k = gather_anchor_geometry(grids, strides, fg_idx)
        origin_k = jnp.take_along_axis(
            origin_reg.astype(jnp.float32), fg_idx[..., None], axis=1
        )
        tx = gt_centers[..., 0] / strides_k - grids_k[..., 0]
        ty = gt_centers[..., 1] / strides_k - grids_k[..., 1]
        if config.reference_parity:
            # reference quirk (`get_l1_target`, losses.py:594-603): the
            # per-ray "radius" is the distance from the IMAGE ORIGIN to
            # the polygon point, not from the object centre
            px = gt_rows[..., 2::2]
            py = gt_rows[..., 3::2]
            r_src = jnp.sqrt(px * px + py * py)
        else:
            r_src = gt_radii  # corrected: true centre-relative radii
        tr = jnp.log(r_src / strides_k[..., None] + 1e-8)
        l1_t = jnp.concatenate([tx[..., None], ty[..., None], tr], axis=-1)
        loss_l1 = jnp.sum(
            jnp.abs(origin_k - l1_t) * w_fg[..., None]
        ) / num_fg
    else:
        loss_l1 = jnp.zeros(())

    # --- DWA weighting (ref losses.py:311-345) ---
    t = config.dwa_temperature
    li = jax.lax.stop_gradient(loss_iou)
    lo = jax.lax.stop_gradient(loss_obj)
    lc = jax.lax.stop_gradient(loss_cls)
    r_iou = jnp.clip(li / (dwa.last_iou + 1e-8), 0.0, 2.0)
    r_obj = jnp.clip(lo / (dwa.last_obj + 1e-8), 0.0, 2.0)
    r_cls = jnp.clip(lc / (dwa.last_cls + 1e-8), 0.0, 2.0)
    denom = jnp.sum(jnp.exp(r_iou / t)) + jnp.exp(r_obj / t) + jnp.exp(r_cls / t)
    reg_w = 26.0 * jnp.exp(r_iou / t) / denom
    obj_w = 26.0 * jnp.exp(r_obj / t) / denom
    cls_w = 26.0 * jnp.exp(r_cls / t) / denom

    total = (
        jnp.sum(reg_w * loss_iou) + obj_w * loss_obj + cls_w * loss_cls
        + loss_l1
    )
    new_dwa = DWAState(last_iou=li, last_obj=lo, last_cls=lc)
    aux = Loss24PAux(
        loss_iou=reg_w * loss_iou,
        loss_obj=loss_obj,
        loss_cls=loss_cls,
        loss_l1=loss_l1,
        num_fg_per_gt=num_fg / num_gts,
        reg_w=reg_w,
        obj_w=obj_w,
        cls_w=cls_w,
        cand_dropped=jnp.sum(assign.num_dropped),
    )
    return total, aux, new_dwa
