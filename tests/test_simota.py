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


def _synth_24p_scene(rng, a_hw=((32, 32), (16, 16), (8, 8)),
                     strides=(8, 16, 32), img=256, m=50, ngt=12,
                     r_lo=4, r_hi=60):
    """Random padded 24p labels + decoded predictions on a real grid."""
    from eop_tpu.models import make_grids_and_strides

    grids, strides_flat = make_grids_and_strides(a_hw, strides)
    a = grids.shape[0]
    labels = np.zeros((m, 51), np.float32)
    ang = np.arange(24) * 15.0 * np.pi / 180.0
    for g in range(ngt):
        cx, cy = rng.uniform(20, img - 20, 2)
        r = rng.uniform(r_lo, r_hi, 24)
        labels[g, 0] = rng.randint(0, 8)
        labels[g, 1:3] = (cx, cy)
        labels[g, 3::2] = cx + r * np.cos(ang)
        labels[g, 4::2] = cy + r * np.sin(ang)
    poly_preds = np.concatenate(
        [
            rng.uniform(0, img, (a, 2)),
            rng.uniform(2, 80, (a, 24)),
        ],
        axis=1,
    ).astype(np.float32)
    obj = rng.randn(a).astype(np.float32)
    cls = rng.randn(a, 8).astype(np.float32)
    return labels, poly_preds, obj, cls, grids, strides_flat


def test_candidate_compaction_matches_full_lattice_24p():
    """cand_cap compaction must reproduce the full-lattice assignment
    exactly whenever the candidate count fits the capacity.  cand_cap is
    set below A so the pruned path actually engages (num_dropped == 0 is
    asserted to prove the capacity held)."""
    from eop_tpu.losses.loss_24p import Loss24PConfig, simota_assign_24p
    from eop_tpu.losses.simota import SimOTAConfig

    rng = np.random.RandomState(7)
    for trial in range(3):
        labels, preds, obj, cls, grids, strides = _synth_24p_scene(
            rng, ngt=5, r_lo=4, r_hi=22
        )
        assert grids.shape[0] > 1024  # cap < A ⇒ compaction engaged
        labels_xy = jnp.asarray(labels[:, 1:])
        gt_classes = jnp.asarray(labels[:, 0])
        gt_valid = jnp.asarray(labels.sum(1) > 0)
        args = (labels_xy, gt_classes, gt_valid, jnp.asarray(preds),
                jnp.asarray(obj), jnp.asarray(cls), grids, strides)
        full = simota_assign_24p(
            *args,
            Loss24PConfig(num_classes=8, simota=SimOTAConfig(cand_cap=0)),
        )
        pruned = simota_assign_24p(
            *args,
            Loss24PConfig(num_classes=8, simota=SimOTAConfig(cand_cap=1024)),
        )
        assert int(pruned.num_dropped) == 0, trial  # capacity held
        np.testing.assert_array_equal(
            np.asarray(full.fg_mask), np.asarray(pruned.fg_mask), trial
        )
        fg = np.asarray(full.fg_mask)
        np.testing.assert_array_equal(
            np.asarray(full.matched_gt)[fg], np.asarray(pruned.matched_gt)[fg]
        )
        np.testing.assert_allclose(
            np.asarray(full.pred_iou), np.asarray(pruned.pred_iou),
            rtol=1e-6, atol=1e-7,
        )
        assert float(full.num_fg) == float(pruned.num_fg)
        assert float(full.num_fg) > 0  # scene actually matches something


def test_candidate_compaction_overflow_keeps_center_anchors_24p():
    """When the superset overflows cand_cap, centre-box anchors (where
    SimOTA matches actually come from) must survive the shed."""
    from eop_tpu.losses.loss_24p import Loss24PConfig, simota_assign_24p
    from eop_tpu.losses.simota import SimOTAConfig

    rng = np.random.RandomState(5)
    labels, preds, obj, cls, grids, strides = _synth_24p_scene(
        rng, ngt=12, r_lo=30, r_hi=110
    )
    labels_xy = jnp.asarray(labels[:, 1:])
    gt_classes = jnp.asarray(labels[:, 0])
    gt_valid = jnp.asarray(labels.sum(1) > 0)
    args = (labels_xy, gt_classes, gt_valid, jnp.asarray(preds),
            jnp.asarray(obj), jnp.asarray(cls), grids, strides)
    tiny = simota_assign_24p(
        *args,
        Loss24PConfig(num_classes=8, simota=SimOTAConfig(cand_cap=256)),
    )
    assert int(tiny.num_dropped) > 0  # capacity genuinely overflowed
    # every valid GT still gets matched (dynamic-k >= 1 per GT)
    assert float(tiny.num_fg) >= float(jnp.sum(gt_valid))

    # priority property of the compaction itself: when the score-2 class
    # (centre-box anchors) fits the capacity, none of them are shed
    from eop_tpu.losses.simota import compact_candidates

    rng2 = np.random.RandomState(0)
    score = rng2.choice([0, 1, 2], size=2000, p=[0.5, 0.4, 0.1])
    cap = 300
    assert (score == 2).sum() <= cap < (score > 0).sum()
    idx, valid, dropped = compact_candidates(jnp.asarray(score), cap)
    kept = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert set(np.flatnonzero(score == 2).tolist()) <= kept
    assert int(dropped) == int((score > 0).sum()) - cap


def test_candidate_compaction_matches_full_lattice_bbox():
    from eop_tpu.losses.simota import SimOTAConfig, simota_assign

    rng = np.random.RandomState(3)
    from eop_tpu.models import make_grids_and_strides

    grids, strides = make_grids_and_strides(
        ((32, 32), (16, 16), (8, 8)), (8, 16, 32)
    )
    a = grids.shape[0]
    m = 50
    labels = np.zeros((m, 5), np.float32)
    for g in range(10):
        labels[g] = [rng.randint(0, 8), rng.uniform(30, 220),
                     rng.uniform(30, 220), rng.uniform(8, 120),
                     rng.uniform(8, 120)]
    preds = np.concatenate(
        [rng.uniform(0, 256, (a, 2)), rng.uniform(4, 120, (a, 2))], 1
    ).astype(np.float32)
    obj = rng.randn(a).astype(np.float32)
    cls = rng.randn(a, 8).astype(np.float32)
    args = (jnp.asarray(labels), jnp.asarray(preds), jnp.asarray(obj),
            jnp.asarray(cls), grids, strides, 8)
    full = simota_assign(*args, SimOTAConfig(cand_cap=0))
    pruned = simota_assign(*args, SimOTAConfig(cand_cap=512))
    np.testing.assert_array_equal(
        np.asarray(full.fg_mask), np.asarray(pruned.fg_mask)
    )
    fg = np.asarray(full.fg_mask)
    np.testing.assert_array_equal(
        np.asarray(full.matched_gt)[fg], np.asarray(pruned.matched_gt)[fg]
    )
    np.testing.assert_allclose(
        np.asarray(full.pred_iou), np.asarray(pruned.pred_iou), rtol=1e-6
    )
    assert float(full.num_fg) == float(pruned.num_fg) > 0


def test_padded_aabb_superset_covers_angle_sum_test():
    """The compaction's cheap pre-mask must cover every anchor the exact
    350°-angle-sum test accepts — including points slightly OUTSIDE the
    polygon (the threshold's 10° slack admits them)."""
    from eop_tpu.ops.polygon import pts_in_poly

    rng = np.random.RandomState(11)
    ang = np.arange(24) * 15.0 * np.pi / 180.0
    for trial in range(50):
        cx, cy = rng.uniform(50, 600, 2)
        r = rng.uniform(2, 200, 24)
        px = (cx + r * np.cos(ang)).astype(np.float32)
        py = (cy + r * np.sin(ang)).astype(np.float32)
        # dense query cloud around the polygon, well past the AABB
        qx = rng.uniform(px.min() - 100, px.max() + 100, 4000).astype(np.float32)
        qy = rng.uniform(py.min() - 100, py.max() + 100, 4000).astype(np.float32)
        inside = np.asarray(
            pts_in_poly(jnp.asarray(px[None]), jnp.asarray(py[None]),
                        jnp.asarray(qx), jnp.asarray(qy))
        )[0]
        perim = np.sqrt(
            (np.roll(px, -1) - px) ** 2 + (np.roll(py, -1) - py) ** 2
        ).sum()
        pad = perim / (350.0 * np.pi / 180.0) + 2.0
        in_aabb = (
            (qx >= px.min() - pad) & (qx <= px.max() + pad)
            & (qy >= py.min() - pad) & (qy <= py.max() + pad)
        )
        escaped = inside & ~in_aabb
        assert not escaped.any(), (
            f"trial {trial}: {escaped.sum()} angle-sum hits outside the "
            f"padded AABB"
        )


def test_compact_candidates_overflow_and_order():
    from eop_tpu.losses.simota import compact_candidates

    mask = jnp.asarray(
        np.array([0, 1, 1, 0, 1, 1, 1, 0, 1], bool)
    )
    idx, valid, dropped = compact_candidates(mask, 4)
    np.testing.assert_array_equal(np.asarray(idx), [1, 2, 4, 5])
    assert np.asarray(valid).all()
    assert int(dropped) == 2  # anchors 6 and 8 beyond capacity

    idx, valid, dropped = compact_candidates(mask, 8)
    np.testing.assert_array_equal(np.asarray(idx)[:6], [1, 2, 4, 5, 6, 8])
    np.testing.assert_array_equal(np.asarray(valid),
                                  [1, 1, 1, 1, 1, 1, 0, 0])
    assert int(dropped) == 0
