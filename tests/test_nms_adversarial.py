"""Adversarial suppression-chain NMS tests.

The fixpoint NMS (`eop_tpu/ops/nms.py::_suppress`) iterates
F(keep)[j] = valid[j] ∧ ¬∃i<j kept suppressor.  Convergence needs as many
iterations as the longest suppression *chain*; the default budget
``max(16, K/8)`` covers dense realistic data but NOT an adversarial chain
of depth ≈ K.  These tests

1. construct that chain (K boxes in a line, each overlapping only its
   neighbour above the threshold) and demonstrate the budget breaking;
2. pin the ``"exact"`` stationarity-checked mode (now used by the
   evaluator infer handles) to greedy ground truth on the chain, under
   vmap, and at the evaluators' real configs (conf 0.01 / nms 0.65 bbox,
   0.3 24p-show) at postprocess candidate capacity.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from eop_tpu.ops.nms import batched_class_nms, nms, nms_on_candidates


def greedy_reference(boxes, scores, thr, valid=None):
    """Plain python greedy NMS — the ground truth."""
    order = np.argsort(-scores, kind="mergesort")
    keep = np.zeros(len(boxes), bool)
    dead = np.zeros(len(boxes), bool)
    x1, y1, x2, y2 = boxes.T
    area = (x2 - x1) * (y2 - y1)
    for i in order:
        if dead[i] or (valid is not None and not valid[i]):
            continue
        keep[i] = True
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / (area[i] + area - inter)
        dead |= iou > thr
    return keep


def chain_boxes(k, iou_target=0.75, width=10.0):
    """K unit-height boxes along a line; consecutive boxes overlap with
    IoU ≈ iou_target, non-consecutive boxes overlap less.  With strictly
    descending scores the greedy answer alternates keep/suppress and the
    suppression-chain depth is ≈ K."""
    # overlap o of two width-w boxes shifted by s: o = w - s;
    # iou = o / (2w - o)  =>  o = 2w·iou/(1+iou)
    overlap = 2 * width * iou_target / (1 + iou_target)
    step = width - overlap
    x1 = np.arange(k) * step
    boxes = np.stack(
        [x1, np.zeros(k), x1 + width, np.ones(k)], axis=1
    ).astype(np.float32)
    scores = np.linspace(1.0, 0.5, k).astype(np.float32)
    return boxes, scores


def test_chain_breaks_fixed_budget_and_exact_mode_survives():
    k = 400
    boxes, scores = chain_boxes(k, iou_target=0.75)
    truth = greedy_reference(boxes, scores, 0.65)
    assert truth.sum() == (k + 1) // 2  # alternating keep pattern

    valid = jnp.ones(k, bool)
    budget = np.asarray(nms_on_candidates(
        jnp.asarray(boxes), valid, 0.65,
        fixpoint_iters=max(16, k // 8),  # the default budget formula
    ))
    exact = np.asarray(nms_on_candidates(
        jnp.asarray(boxes), valid, 0.65, fixpoint_iters="exact",
    ))
    # the adversarial chain defeats the fixed budget...
    assert not np.array_equal(budget, truth), (
        "budget unexpectedly survived the adversarial chain — "
        "tighten this test (deeper chain) or update the nms docs"
    )
    # ...and the exact mode matches greedy exactly
    np.testing.assert_array_equal(exact, truth)


@pytest.mark.parametrize("thr", [0.65, 0.3])
def test_exact_mode_matches_greedy_at_eval_configs(thr):
    """Evaluator configs: conf 0.01 with nms 0.65 (bbox) / 0.3 (24p show)
    at the postprocess candidate capacity (512)."""
    rng = np.random.RandomState(0)
    k = 512
    xy = rng.rand(k, 2).astype(np.float32) * 60  # dense: many overlaps
    wh = rng.rand(k, 2).astype(np.float32) * 40 + 4
    boxes = np.concatenate([xy, xy + wh], axis=1)
    scores = rng.rand(k).astype(np.float32)
    valid_np = scores >= 0.01

    order = np.argsort(-scores, kind="mergesort")
    keep_sorted = np.asarray(nms_on_candidates(
        jnp.asarray(boxes[order]), jnp.asarray(valid_np[order]), thr,
        fixpoint_iters="exact",
    ))
    ours = np.zeros(k, bool)
    ours[order[keep_sorted]] = True
    truth = greedy_reference(boxes, scores, thr, valid=valid_np)
    np.testing.assert_array_equal(ours, truth)


def test_exact_mode_under_vmap_and_classful():
    """The evaluators run the exact mode inside jit+vmap with class-aware
    suppression; chains must stay exact there too."""
    k = 200
    boxes, scores = chain_boxes(k, iou_target=0.8)
    classes = np.zeros(k, np.int32)
    classes[1::4] = 1  # a second class breaks some links

    def one(b, s, c):
        keep, order = batched_class_nms(b, s, c, 0.65,
                                        fixpoint_iters="exact")
        out = jnp.zeros(k, bool)
        return out.at[order].set(keep)

    batched = jax.jit(jax.vmap(one))
    b = jnp.asarray(np.stack([boxes, boxes]))
    s = jnp.asarray(np.stack([scores, scores[::-1].copy()]))
    c = jnp.asarray(np.stack([classes, classes]))
    got = np.asarray(batched(b, s, c))

    for i in range(2):
        sn, cn = np.asarray(s[i]), np.asarray(c[i])
        # classful greedy ground truth: suppression only within a class
        order = np.argsort(-sn, kind="mergesort")
        keep = np.zeros(k, bool)
        dead = np.zeros(k, bool)
        x1, y1, x2, y2 = boxes.T
        area = (x2 - x1) * (y2 - y1)
        for j in order:
            if dead[j]:
                continue
            keep[j] = True
            xx1 = np.maximum(x1[j], x1)
            xx2 = np.minimum(x2[j], x2)
            inter = np.clip(xx2 - xx1, 0, None) * 1.0
            iou = inter / (area[j] + area - inter)
            dead |= (iou > 0.65) & (cn == cn[j])
        np.testing.assert_array_equal(got[i], keep, err_msg=f"batch {i}")


def test_int_budget_k_is_exact():
    """A budget of K iterations is always exact (documented fallback)."""
    k = 300
    boxes, scores = chain_boxes(k, iou_target=0.7)
    truth = greedy_reference(boxes, scores, 0.65)
    keep, order = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.65,
                      fixpoint_iters=k)
    got = np.zeros(k, bool)
    got[np.asarray(order)[np.asarray(keep)]] = True
    np.testing.assert_array_equal(got, truth)
