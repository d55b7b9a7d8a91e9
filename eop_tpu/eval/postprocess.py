"""Batched post-processing (conf filter -> NMS) with static output capacity.

Parity targets:
* bbox `postprocess` (`/root/reference/yolox/utils/boxes.py:32-73`):
  cxcywh -> xyxy, per-anchor best class, conf filter at
  ``obj_conf * class_conf``, torchvision (batched_)nms, detection rows
  ``[x1, y1, x2, y2, obj_conf, class_conf, class_pred]``.
* 24p `postprocess` (`/root/reference/yolox_24p/utils/boxes.py:29-99`):
  decode the 24 radii to xy points, take the min/max rectangle, NMS on that
  rectangle, keep rows ``[x, y, r1..r24, obj_conf, class_conf, class_pred]``.
  The reference scales each direction vector by its angle (θ·cosθ — ray 0
  collapses; `boxes.py:32-33`), distorting the NMS rectangles;
  ``reference_parity=True`` reproduces it, default uses correct cosθ
  (matching the reference's own drawing code, `show_24p.py:346-353`).

TPU-first: the reference returns Python lists of variable-length tensors;
here every image yields exactly ``max_detections`` rows plus a validity
mask, so the whole batch post-processes inside one jitted XLA program and
transfers one fixed-size host array.

Two entry levels per family:

* ``postprocess_{bbox,24p}(decoded, ...)`` — takes the fully decoded
  [B, A, D] tensor (the reference's data flow: decode everything, then
  filter).
* ``postprocess_{bbox,24p}_heads(head_outs, ...)`` — takes the RAW
  per-scale head maps and decodes **after** candidate selection.  The grid
  decode is elementwise per anchor, so ``decode(gather(x)) ==
  gather(decode(x))`` — results are bitwise identical — but the fused
  order never materializes the full-lattice fp32 decode (a [B, 8400, D]
  HBM write) and gathers candidate rows in the model's bf16 (half the
  bytes).  Measured on v5e @B=128 (tools/bench_postprocess.py): the
  postprocess share drops ~11.4 → ~5 ms/batch.  This is the path the Exp
  infer/serving builders and bench.py use.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.boxes import cxcywh2xyxy
from ..ops.nms import nms_on_candidates
from ..ops.polygon import polygon_points_from_radii


class Detections(NamedTuple):
    """Fixed-capacity detections: rows [B, max_det, D], valid [B, max_det]."""

    rows: jnp.ndarray
    valid: jnp.ndarray

    @property
    def count(self):
        return jnp.sum(self.valid, axis=-1)


def _select_rows(cand, keep, max_det):
    """Compact kept candidate rows (already score-sorted) into the first
    slots.

    Cumsum-scatter compaction instead of an argsort: sorts lower to a full
    per-row sort on TPU, the scatter is O(K).
    """
    # always allocate the documented max_det capacity: with fewer
    # candidates than max_det the tail is simply invalid padding; with
    # more, the lowest-scored surplus keeps drop via the scatter clip —
    # never a silently smaller output shape
    m = max_det
    dest = jnp.where(keep, jnp.cumsum(keep) - 1, m)  # drop slot for ~keep
    out = jnp.zeros((m, cand.shape[-1]), cand.dtype)
    out = out.at[jnp.clip(dest, 0, m)].set(cand, mode="drop")
    n_kept = jnp.sum(keep)
    valid = jnp.arange(m) < jnp.minimum(n_kept, m)
    return out, valid


def _nms_and_pack(geom, boxes, top_scores, c_obj, c_cls_conf, c_cls_id,
                  conf_thre, nms_thre, class_agnostic, fixpoint_iters,
                  max_det):
    """Shared tail of every postprocess variant: candidate NMS, row
    assembly ``[geom | obj | cls_conf | cls_id]``, score-order compaction.
    One copy so a row-layout or NMS-argument change cannot skew the four
    entry points apart."""
    keep = nms_on_candidates(
        boxes, top_scores >= conf_thre, nms_thre,
        class_ids=None if class_agnostic else c_cls_id,
        fixpoint_iters=fixpoint_iters,
    )
    rows = jnp.concatenate(
        [geom, c_obj[:, None], c_cls_conf[:, None],
         c_cls_id.astype(geom.dtype)[:, None]],
        axis=1,
    )
    return _select_rows(rows, keep, max_det)


def postprocess_bbox(
    decoded,                    # [B, A, 5+C]: cxcywh, obj, cls (sigmoided)
    num_classes: int,
    conf_thre: float = 0.7,
    nms_thre: float = 0.45,
    class_agnostic: bool = False,
    max_detections: int = 300,
    nms_candidates: int = 512,
    nms_fixpoint_iters: int | str | None = None,
) -> Detections:
    """Returns rows [B, max_det, 7]: x1, y1, x2, y2, obj, cls_conf, cls."""

    def per_image(pred):
        obj = pred[:, 4]
        cls_conf = jnp.max(pred[:, 5 : 5 + num_classes], axis=1)
        cls_id = jnp.argmax(pred[:, 5 : 5 + num_classes], axis=1)
        scores = obj * cls_conf
        # top-K first; the box decode + output rows only matter for the
        # NMS candidates (see postprocess_24p)
        top_scores, order = jax.lax.top_k(
            scores, min(nms_candidates, scores.shape[0])
        )
        cand = pred[order]  # one row gather (see postprocess_24p note)
        boxes = cxcywh2xyxy(cand[:, :4])
        return _nms_and_pack(
            boxes, boxes, top_scores, cand[:, 4],
            jnp.take(cls_conf, order), jnp.take(cls_id, order),
            conf_thre, nms_thre, class_agnostic, nms_fixpoint_iters,
            max_detections,
        )

    rows, valid = jax.vmap(per_image)(decoded)
    return Detections(rows=rows, valid=valid)


def _decoded_candidates(flat, grids, strides_flat, reg_dim: int,
                        num_classes: int, k: int):
    """Score -> top-k -> gather -> decode for ONE image's raw flattened
    head output ``flat [A, reg_dim+1+C]`` (model dtype).

    Bitwise identical to decoding the full lattice first (i.e. the
    ``postprocess_*(decoded)`` entry points fed fp32-decoded outputs):
    scores are computed in fp32 from the same (upcast) logits — sigmoid
    is monotone non-decreasing, so ``max`` commutes with it exactly even
    where fp32 sigmoid collapses neighboring logits — and the grid decode
    is elementwise per anchor, so gathering raw rows then decoding equals
    decoding then gathering.  ``argmax`` does NOT commute through those
    collapses (the decoded path would tie-break to the earlier class), so
    the argmax must run on the sigmoided values, not the raw logits.
    """
    logits = flat[:, reg_dim:].astype(jnp.float32)
    obj = jax.nn.sigmoid(logits[:, 0])
    cls_probs = jax.nn.sigmoid(logits[:, 1:1 + num_classes])
    cls_conf = jnp.max(cls_probs, axis=1)
    cls_id = jnp.argmax(cls_probs, axis=1)
    top_scores, order = jax.lax.top_k(obj * cls_conf, min(k, flat.shape[0]))
    cand = flat[order].astype(jnp.float32)  # ONE row gather in model dtype
    s = strides_flat[order][:, None]
    xy = (cand[:, :2] + grids[order]) * s
    # exp clamp matches decode_outputs (models/head.py)
    sizes = jnp.exp(jnp.clip(cand[:, 2:reg_dim], -30.0, 30.0)) * s
    return (top_scores, xy, sizes, jnp.take(obj, order),
            jnp.take(cls_conf, order), jnp.take(cls_id, order))


def _flatten_heads(head_outs, strides):
    from ..models.head import flatten_head_outputs, make_grids_and_strides

    flat = flatten_head_outputs(head_outs)
    grids, strides_flat = make_grids_and_strides(
        [o.shape[1:3] for o in head_outs], strides, jnp.float32
    )
    return flat, grids, strides_flat


def postprocess_bbox_heads(
    head_outs,                  # raw per-scale NHWC maps from the head
    num_classes: int,
    conf_thre: float = 0.7,
    nms_thre: float = 0.45,
    class_agnostic: bool = False,
    max_detections: int = 300,
    nms_candidates: int = 512,
    nms_fixpoint_iters: int | str | None = None,
    strides=(8, 16, 32),
) -> Detections:
    """`postprocess_bbox` fused with the grid decode (see module
    docstring); bitwise-equal results, ~2x cheaper postprocess."""
    flat, grids, strides_flat = _flatten_heads(head_outs, strides)

    def per_image(fl):
        top_scores, xy, wh, c_obj, c_cls_conf, c_cls_id = \
            _decoded_candidates(fl, grids, strides_flat, 4, num_classes,
                                nms_candidates)
        boxes = cxcywh2xyxy(jnp.concatenate([xy, wh], axis=-1))
        return _nms_and_pack(
            boxes, boxes, top_scores, c_obj, c_cls_conf, c_cls_id,
            conf_thre, nms_thre, class_agnostic, nms_fixpoint_iters,
            max_detections,
        )

    rows, valid = jax.vmap(per_image)(flat)
    return Detections(rows=rows, valid=valid)


def postprocess_24p_heads(
    head_outs,
    num_classes: int,
    conf_thre: float = 0.01,
    nms_thre: float = 0.3,
    class_agnostic: bool = False,
    max_detections: int = 300,
    nms_candidates: int = 512,
    reference_parity: bool = False,
    nms_fixpoint_iters: int | str | None = None,
    strides=(8, 16, 32),
) -> Detections:
    """`postprocess_24p` fused with the grid decode (see module
    docstring); bitwise-equal results, ~2x cheaper postprocess."""
    flat, grids, strides_flat = _flatten_heads(head_outs, strides)

    def per_image(fl):
        top_scores, centers, radii, c_obj, c_cls_conf, c_cls_id = \
            _decoded_candidates(fl, grids, strides_flat, 26, num_classes,
                                nms_candidates)
        pts = polygon_points_from_radii(centers, radii, reference_parity)
        boxes = jnp.concatenate(
            [jnp.min(pts, axis=1), jnp.max(pts, axis=1)], axis=-1
        )
        return _nms_and_pack(
            jnp.concatenate([centers, radii], axis=1), boxes, top_scores,
            c_obj, c_cls_conf, c_cls_id,
            conf_thre, nms_thre, class_agnostic, nms_fixpoint_iters,
            max_detections,
        )

    rows, valid = jax.vmap(per_image)(flat)
    return Detections(rows=rows, valid=valid)


def postprocess_24p(
    decoded,                    # [B, A, 27+C]: x, y, 24 radii, obj, cls
    num_classes: int,
    conf_thre: float = 0.01,
    nms_thre: float = 0.3,
    class_agnostic: bool = False,
    max_detections: int = 300,
    nms_candidates: int = 512,
    reference_parity: bool = False,
    nms_fixpoint_iters: int | str | None = None,
) -> Detections:
    """Returns rows [B, max_det, 29]: x, y, r1..r24, obj, cls_conf, cls."""

    def per_image(pred):
        obj = pred[:, 26]
        cls_conf = jnp.max(pred[:, 27 : 27 + num_classes], axis=1)
        cls_id = jnp.argmax(pred[:, 27 : 27 + num_classes], axis=1)
        scores = obj * cls_conf

        # top-K FIRST: the polygon decode + enclosing-rect geometry and
        # the output rows are only needed for the NMS candidates — doing
        # them on all A anchors cost ~16x more (measured −3 ms/batch at
        # B=128 on v5e)
        top_scores, order = jax.lax.top_k(
            scores, min(nms_candidates, scores.shape[0])
        )
        cand = pred[order]  # ONE row gather; narrow per-column gathers
        # lower to pathological TPU gathers (measured 15x slower)
        centers = cand[:, 0:2]
        radii = cand[:, 2:26]
        c_obj = cand[:, 26]
        c_cls_conf = jnp.take(cls_conf, order)
        c_cls_id = jnp.take(cls_id, order)

        pts = polygon_points_from_radii(centers, radii, reference_parity)
        boxes = jnp.concatenate(
            [jnp.min(pts, axis=1), jnp.max(pts, axis=1)], axis=-1
        )  # [K, 4] xyxy enclosing rect
        return _nms_and_pack(
            jnp.concatenate([centers, radii], axis=1), boxes, top_scores,
            c_obj, c_cls_conf, c_cls_id,
            conf_thre, nms_thre, class_agnostic, nms_fixpoint_iters,
            max_detections,
        )

    rows, valid = jax.vmap(per_image)(decoded)
    return Detections(rows=rows, valid=valid)
