"""TPU-native non-maximum suppression.

The reference delegates NMS to `torchvision.ops.nms/batched_nms`
(`/root/reference/yolox/utils/boxes.py:53-65`), a CUDA kernel with dynamic
output shapes.  Dynamic shapes defeat XLA, so this module implements NMS the
TPU way:

* **static capacity** — callers pass a fixed candidate count (we pre-select
  the top-K scoring boxes) and get back a fixed-size keep *mask*;
* **O(K²) matrix formulation** — one pairwise-IoU matrix plus a bounded
  iterate-to-fixpoint recurrence (see `_suppress`) maps cleanly onto the
  VPU with no long serial dependency chain;
* **class-aware NMS via a same-class suppression mask** (exact
  `torchvision.ops.batched_nms` semantics; see `batched_class_nms` for why
  the coordinate-offset trick is unsafe with exp-decoded boxes).

Everything is jit-/vmap-compatible; a whole batch runs inside one XLA
program with no host round-trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import bboxes_iou


def _suppress(iou: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float,
              same_class: jnp.ndarray | None = None,
              fixpoint_iters: int | str | None = None):
    """Greedy NMS over boxes already sorted by descending score, computed
    as an iterate-to-fixpoint matrix recurrence instead of a K-step serial
    sweep.

    The greedy solution is the unique fixpoint of
        F(keep)[j] = valid[j] ∧ ¬∃ i<j: keep[i] ∧ iou[i,j] > t
    (uniqueness follows by induction over the strictly-lower-index
    dependency order), and iterating F from ``valid`` converges in
    D iterations where D is the longest suppression chain — typically a
    handful, vs the K (≈1000) sequential steps of a scan formulation.
    Each iteration is one [K, K] masked reduction on the VPU.

    Args:
      iou: [K, K] pairwise IoU of the sorted candidates.
      valid: [K] bool — candidate passes the score threshold.
      fixpoint_iters: ``"exact"`` (the default, ``None``) for a
        stationarity-checked ``while_loop`` — greedy-exact for arbitrary
        adversarial chains AND measured faster than the old scaled budget
        (v5e, B=128 K=512: the realized chain depth is well under the
        64-iteration budget, so the adaptive loop does less work).  An
        int fixes the iteration budget instead — the only reason to want
        that is a hard static schedule; budgets below the realized chain
        depth are not greedy-exact.
    Returns:
      keep: [K] bool mask in sorted order.
    """
    k = iou.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    overlap = (iou > iou_threshold) & (row < col)  # i suppresses j only if i<j
    if same_class is not None:
        overlap &= same_class

    def apply_f(cur):
        suppressed = jnp.any(overlap & cur[:, None], axis=0)
        return valid & ~suppressed

    # "exact" (default): iterate until stationary.  F's fixpoint is unique
    # and equals the greedy solution, so F(keep) == keep certifies
    # exactness — this mode is greedy-exact for ANY input, including
    # adversarial suppression chains of depth K (where any fixed budget
    # < K is wrong; pinned by tests/test_nms_adversarial.py).  Cost is
    # data-adaptive: one [K, K] reduction per chain-depth level — measured
    # ~2 ms/batch cheaper than the 64-iteration scaled budget at B=128
    # K=512 on v5e (tools/bench_postprocess.py), because realistic chain
    # depths stay in the teens.
    if fixpoint_iters is None or fixpoint_iters == "exact":
        def cond(state):
            _, changed, i = state
            return changed & (i < k)

        def body(state):
            cur, _, i = state
            new = apply_f(cur)
            return new, jnp.any(new != cur), i + 1

        keep, _, _ = jax.lax.while_loop(
            cond, body, (valid, jnp.asarray(True), jnp.asarray(0))
        )
        return keep

    # Fixed iteration budget (int): convergence needs (suppression chain
    # depth) iterations; measured depth on dense worst-case data (1000
    # random boxes/img, 37% survivors) is <16.  A budget below the
    # realized depth silently yields non-greedy keeps — only use this for
    # a hard static schedule (k as the budget is always exact).
    iters = min(fixpoint_iters, k)

    return jax.lax.fori_loop(0, iters, lambda _, cur: apply_f(cur), valid)


def nms_on_candidates(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    class_ids: jnp.ndarray | None = None,
    fixpoint_iters: int | str | None = None,
) -> jnp.ndarray:
    """NMS over candidates ALREADY sorted by descending score.

    The shared core of `nms`/`batched_class_nms` and the postprocess
    paths (which pre-select their candidates with their own top-k).

    Args:
      boxes: [K, 4] xyxy, score-sorted.
      valid: [K] bool — candidate passes the score threshold.
      class_ids: optional [K] — boxes of different classes never
        suppress each other (torchvision `batched_nms` semantics).
    Returns: keep [K] bool.
    """
    iou = bboxes_iou(boxes, boxes, xyxy=True)
    same = (
        None if class_ids is None
        else class_ids[:, None] == class_ids[None, :]
    )
    return _suppress(iou, valid, iou_threshold, same_class=same,
                     fixpoint_iters=fixpoint_iters)


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    score_threshold: float = 0.0,
    max_candidates: int | None = None,
    fixpoint_iters: int | str | None = None,
):
    """Class-agnostic NMS with static shapes.

    Args:
      boxes: [N, 4] xyxy.
      scores: [N].
      iou_threshold: suppression threshold.
      score_threshold: candidates strictly below it are masked out
        (``>=`` keeps, matching the reference's ``obj*cls >= conf_thre``,
        `yolox/utils/boxes.py:52`).
      max_candidates: top-K pre-selection (defaults to N).
      fixpoint_iters: suppression-recurrence schedule; the default (None)
        is the exact adaptive loop — greedy-exact at any chain depth (see
        `_suppress`).  Pass an int only to force a fixed budget.

    Returns:
      (keep_mask [K], order [K]) — ``order`` indexes into the original N,
      ``keep_mask[i]`` says whether candidate ``order[i]`` survives.
    """
    n = boxes.shape[0]
    k = n if max_candidates is None else min(max_candidates, n)
    top_scores, order = jax.lax.top_k(scores, k)
    keep = nms_on_candidates(
        boxes[order], top_scores >= score_threshold, iou_threshold,
        fixpoint_iters=fixpoint_iters,
    )
    return keep, order


def batched_class_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    class_ids: jnp.ndarray,
    iou_threshold: float,
    score_threshold: float = 0.0,
    max_candidates: int | None = None,
    fixpoint_iters: int | str | None = None,
):
    """Per-class NMS (torchvision `batched_nms` semantics, ref
    `boxes.py:60-65`): boxes of different classes never suppress each
    other.

    Implemented as a same-class mask on the suppression matrix rather than
    torchvision's coordinate-offset trick: with exp-decoded boxes a single
    degenerate prediction can make ``max(|boxes|)`` so large that
    ``boxes + class_id * max_coord`` collapses every box of a class onto
    one f32 value (zero-area, IoU 0) and NMS silently stops suppressing.
    The mask costs one extra [K, K] compare and is exact for any inputs.
    """
    n = boxes.shape[0]
    k = n if max_candidates is None else min(max_candidates, n)
    top_scores, order = jax.lax.top_k(scores, k)
    keep = nms_on_candidates(
        boxes[order], top_scores >= score_threshold, iou_threshold,
        class_ids=class_ids[order], fixpoint_iters=fixpoint_iters,
    )
    return keep, order
