"""SimOTA parity: the static-shape matcher vs the reference's
`dynamic_k_matching` / `get_in_boxes_info` (torch, CPU)."""

import numpy as np
import torch

import jax.numpy as jnp

from eop_tpu.losses.simota import in_boxes_info, simota_match

import ref_loader


def _ref_head():
    head_mod = ref_loader.ref_module("yolo_head")
    return head_mod.YOLOXHead


def test_dynamic_k_matching_parity():
    YOLOXHead = _ref_head()
    rng = np.random.RandomState(0)
    for trial in range(5):
        g, a = rng.randint(1, 12), rng.randint(30, 200)
        cost = rng.uniform(0.1, 50.0, (g, a)).astype(np.float32)
        ious = rng.uniform(0.0, 1.0, (g, a)).astype(np.float32)
        gt_classes = rng.randint(0, 8, g).astype(np.float32)

        fg_mask = torch.ones(a, dtype=torch.bool)
        (
            ref_num_fg,
            ref_classes,
            ref_pred_ious,
            ref_matched,
        ) = YOLOXHead.dynamic_k_matching(
            None,
            torch.from_numpy(cost.copy()),
            torch.from_numpy(ious.copy()),
            torch.from_numpy(gt_classes),
            g,
            fg_mask,
        )
        ref_fg = fg_mask.numpy()

        is_cand = jnp.ones((g, a), bool)
        valid = jnp.ones((g,), bool)
        _, fg, matched_gt, pred_iou, num_fg = simota_match(
            jnp.asarray(cost), jnp.asarray(ious), is_cand, valid
        )
        fg = np.asarray(fg)

        assert int(num_fg) == int(ref_num_fg), trial
        np.testing.assert_array_equal(fg, ref_fg)
        np.testing.assert_array_equal(
            np.asarray(matched_gt)[fg], ref_matched.numpy()
        )
        np.testing.assert_allclose(
            np.asarray(pred_iou)[fg], ref_pred_ious.numpy(), rtol=1e-6
        )


def test_in_boxes_info_parity():
    YOLOXHead = _ref_head()
    rng = np.random.RandomState(1)
    g, a = 7, 120
    strides = np.repeat([8.0, 16.0, 32.0], 40).astype(np.float32)
    gx = rng.randint(0, 10, a).astype(np.float32)
    gy = rng.randint(0, 10, a).astype(np.float32)
    gt = np.stack(
        [
            rng.uniform(20, 300, g),
            rng.uniform(20, 300, g),
            rng.uniform(10, 120, g),
            rng.uniform(10, 120, g),
        ],
        axis=1,
    ).astype(np.float32)

    ref_anchor_mask, ref_in_both = YOLOXHead.get_in_boxes_info(
        None,
        torch.from_numpy(gt),
        torch.from_numpy(strides[None]),
        torch.from_numpy(gx[None]),
        torch.from_numpy(gy[None]),
        a,
        g,
    )

    grids = jnp.stack([jnp.asarray(gx), jnp.asarray(gy)], axis=1)
    in_boxes, in_centers = in_boxes_info(
        jnp.asarray(gt), jnp.ones((g,), bool), grids,
        jnp.asarray(strides), 2.5,
    )
    fg_candidate = np.asarray(jnp.any(in_boxes, 0) | jnp.any(in_centers, 0))
    in_both = np.asarray(in_boxes & in_centers)

    np.testing.assert_array_equal(fg_candidate, ref_anchor_mask.numpy())
    # the reference returns in_both already gathered to candidate columns
    np.testing.assert_array_equal(
        in_both[:, fg_candidate], ref_in_both.numpy()
    )


def test_matched_anchor_uniqueness():
    """After dedup no anchor belongs to two GTs; invalid GTs never match."""
    rng = np.random.RandomState(2)
    g, a = 20, 300
    cost = jnp.asarray(rng.uniform(0.1, 10.0, (g, a)).astype(np.float32))
    ious = jnp.asarray(rng.uniform(0, 1, (g, a)).astype(np.float32))
    valid = jnp.asarray(np.arange(g) < 9)
    cand = jnp.ones((g, a), bool)
    cost = cost + 1e6 * (~valid)[:, None]
    matching, fg, matched_gt, pred_iou, num_fg = simota_match(
        cost, jnp.where(valid[:, None], ious, 0.0), cand, valid
    )
    m = np.asarray(matching)
    assert (m.sum(0) <= 1).all()
    assert not m[9:].any()
    assert int(num_fg) == int(np.asarray(fg).sum())
