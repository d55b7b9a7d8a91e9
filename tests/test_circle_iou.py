"""Numeric parity of the concentric-circle GIoU ops vs the reference torch
implementation (`yolox_24p/models/losses.py`, `yolox_24p/utils/boxes.py`)."""

import numpy as np
import torch

import jax.numpy as jnp

from eop_tpu.ops.circle_iou import (
    matched_circle_giou_loss,
    pairwise_circle_giou_loss,
)
from eop_tpu.ops.polygon import ANGLES

import ref_loader


def make_labels(n, rng, radius_range=(5.0, 60.0), center_range=(100.0, 500.0)):
    """Rows [cx, cy, 24 x (x, y)] built from random radii."""
    cx = rng.uniform(*center_range, n)
    cy = rng.uniform(*center_range, n)
    r = rng.uniform(*radius_range, (n, 24))
    rows = np.zeros((n, 50), np.float32)
    rows[:, 0] = cx
    rows[:, 1] = cy
    rows[:, 2::2] = cx[:, None] + r * np.cos(ANGLES)
    rows[:, 3::2] = cy[:, None] + r * np.sin(ANGLES)
    return rows.astype(np.float32), r.astype(np.float32)


def test_matched_circle_giou_loss_parity():
    losses = ref_loader.ref_24p_losses()
    rng = np.random.RandomState(0)
    n = 64
    target, gt_r = make_labels(n, rng)
    pred = np.zeros((n, 26), np.float32)
    pred[:, 0] = rng.uniform(100, 500, n)
    pred[:, 1] = rng.uniform(100, 500, n)
    pred[:, 2:] = rng.uniform(5, 60, (n, 24))

    ref_loss, _ = losses.IOUloss().forward(
        torch.from_numpy(pred), torch.from_numpy(target)
    )
    ours = matched_circle_giou_loss(
        jnp.asarray(target[:, 0:2]),
        jnp.asarray(gt_r),
        jnp.asarray(pred[:, 0:2]),
        jnp.asarray(pred[:, 2:]),
    )
    np.testing.assert_allclose(
        ref_loss.numpy(), np.asarray(ours), rtol=2e-5, atol=2e-5
    )


def test_pairwise_circle_giou_loss_parity():
    boxes24 = ref_loader.ref_24p_boxes()
    rng = np.random.RandomState(1)
    g, p = 12, 37
    target, _ = make_labels(g, rng)
    pred = np.zeros((p, 26), np.float32)
    pred[:, 0] = rng.uniform(100, 500, p)
    pred[:, 1] = rng.uniform(100, 500, p)
    pred[:, 2:] = rng.uniform(5, 60, (p, 24))

    ref = boxes24.bboxes_iou(
        torch.from_numpy(target), torch.from_numpy(pred)
    ).numpy()

    from eop_tpu.ops.polygon import radii_from_points

    gt_r = radii_from_points(jnp.asarray(target))
    ours = pairwise_circle_giou_loss(
        jnp.asarray(target[:, 0:2]), gt_r,
        jnp.asarray(pred[:, 0:2]), jnp.asarray(pred[:, 2:]),
    )
    np.testing.assert_allclose(ref, np.asarray(ours), rtol=2e-5, atol=2e-5)


def test_overlap_branches():
    """Containment / disjoint / partial-overlap branches behave geometrically."""
    from eop_tpu.ops.circle_iou import circle_inter

    # identical circles at zero distance -> full area
    a = circle_inter(jnp.asarray(0.0), jnp.asarray(2.0), jnp.asarray(2.0))
    np.testing.assert_allclose(float(a), np.pi * 4.0, rtol=1e-6)
    # disjoint
    a = circle_inter(jnp.asarray(10.0), jnp.asarray(2.0), jnp.asarray(3.0))
    assert float(a) == 0.0
    # contained: small circle area
    a = circle_inter(jnp.asarray(1.0), jnp.asarray(5.0), jnp.asarray(2.0))
    np.testing.assert_allclose(float(a), np.pi * 4.0, rtol=1e-6)
    # partial overlap: strictly between 0 and the small circle's area
    a = float(circle_inter(jnp.asarray(4.0), jnp.asarray(3.0), jnp.asarray(2.0)))
    assert 0.0 < a < np.pi * 4.0
