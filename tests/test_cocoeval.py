"""COCO AP evaluation tests: C++ matcher vs numpy oracle, and known-value
AP scenarios through the full COCOeval pipeline."""

import numpy as np
import pytest

from eop_tpu.data.coco_api import COCO
from eop_tpu.eval.coco_eval import COCOeval
from eop_tpu.layers.fast_cocoeval import (
    match_image,
    match_image_py,
    native_available,
)


def test_native_matcher_builds():
    assert native_available(), "C++ matcher failed to build"


def test_matcher_fuzz_native_vs_python():
    rng = np.random.RandomState(0)
    thrs = np.linspace(0.5, 0.95, 10)
    for trial in range(20):
        D, G = rng.randint(0, 12), rng.randint(0, 8)
        iou = rng.rand(D, G)
        gt_ig = rng.randint(0, 2, G).astype(np.int32)
        # keep ignores-last ordering invariant (caller sorts this way)
        gt_ig = np.sort(gt_ig)
        crowd = (gt_ig & rng.randint(0, 2, G)).astype(np.int32)
        dt_oor = rng.randint(0, 2, D).astype(np.int32)
        a = match_image(thrs, iou, gt_ig, crowd, dt_oor)
        b = match_image_py(thrs, iou, gt_ig, crowd, dt_oor)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y, err_msg=f"trial {trial}")


def _make_gt(boxes_per_img, cats=(1,)):
    """boxes_per_img: {img_id: [(x, y, w, h, cat), ...]}"""
    images, annotations = [], []
    aid = 1
    for img_id, boxes in boxes_per_img.items():
        images.append(
            {"id": img_id, "width": 640, "height": 640,
             "file_name": f"{img_id}.jpg"}
        )
        for (x, y, w, h, c) in boxes:
            annotations.append(
                {"id": aid, "image_id": img_id, "category_id": c,
                 "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0}
            )
            aid += 1
    gt = COCO()
    gt.dataset = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c, "name": str(c)} for c in cats],
    }
    gt.createIndex()
    return gt


def _eval(gt, dets):
    dt = gt.loadRes(dets)
    e = COCOeval(gt, dt, "bbox")
    e.evaluate()
    e.accumulate()
    e.summarize()
    return e.stats


def test_perfect_detections_ap1():
    gt = _make_gt({1: [(10, 10, 50, 60, 1), (200, 200, 80, 40, 1)],
                   2: [(5, 5, 100, 100, 1)]})
    dets = []
    for ann in gt.dataset["annotations"]:
        dets.append(
            {"image_id": ann["image_id"], "category_id": 1,
             "bbox": list(ann["bbox"]), "score": 0.9}
        )
    stats = _eval(gt, dets)
    assert stats[0] == pytest.approx(1.0)
    assert stats[1] == pytest.approx(1.0)
    assert stats[8] == pytest.approx(1.0)  # AR@100


def test_half_recall_known_ap():
    """1 TP (score .9) + 1 FP (score .8), 2 GTs: AP50 = 51/101."""
    gt = _make_gt({1: [(10, 10, 50, 50, 1), (300, 300, 50, 50, 1)]})
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 50],
         "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [500, 500, 50, 50],
         "score": 0.8},
    ]
    stats = _eval(gt, dets)
    assert stats[1] == pytest.approx(51 / 101, abs=1e-6)


def test_low_iou_below_threshold_is_fp():
    gt = _make_gt({1: [(0, 0, 100, 100, 1)]})
    # IoU = 25*... box shifted so IoU < 0.5
    dets = [{"image_id": 1, "category_id": 1, "bbox": [80, 80, 100, 100],
             "score": 0.9}]
    stats = _eval(gt, dets)
    assert stats[1] == pytest.approx(0.0)


def test_crowd_gt_not_counted():
    """Matching a crowd GT neither scores nor penalizes."""
    gt = _make_gt({1: [(0, 0, 100, 100, 1)]})
    gt.dataset["annotations"][0]["iscrowd"] = 1
    gt.createIndex()
    dets = [{"image_id": 1, "category_id": 1, "bbox": [0, 0, 100, 100],
             "score": 0.9}]
    dt = gt.loadRes(dets)
    e = COCOeval(gt, dt, "bbox")
    e.evaluate()
    e.accumulate()
    # no non-ignored GT -> precision stays -1 (undefined), stats all -1
    e.summarize()
    assert e.stats[0] == -1.0


def test_area_ranges():
    """A small (16x16) and a large (200x200) object split across ranges."""
    gt = _make_gt({1: [(0, 0, 16, 16, 1), (300, 300, 200, 200, 1)]})
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 16, 16],
         "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [300, 300, 200, 200],
         "score": 0.8},
    ]
    stats = _eval(gt, dets)
    assert stats[0] == pytest.approx(1.0)
    assert stats[3] == pytest.approx(1.0)   # small
    assert stats[5] == pytest.approx(1.0)   # large
    assert stats[4] == -1.0                 # medium: no gts


def test_no_detections_at_all():
    """GTs present, zero detections: AP must be 0 (not crash — np.where
    eagerly indexed the empty dt-ids array)."""
    gt = _make_gt({1: [(10, 10, 50, 50, 1)]})
    dt = gt.loadRes([])
    e = COCOeval(gt, dt, "bbox")
    e.evaluate()
    e.accumulate()
    e.summarize()
    assert e.stats[0] == pytest.approx(0.0)


def test_detections_for_empty_image():
    """Detections on an image with no GT of that category count as FPs."""
    gt = _make_gt({1: [(10, 10, 50, 50, 1)], 2: []})
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 50],
         "score": 0.9},
        {"image_id": 2, "category_id": 1, "bbox": [5, 5, 20, 20],
         "score": 0.95},
    ]
    stats = _eval(gt, dets)
    # FP at higher score halves the precision envelope at recall 1
    assert 0.4 < stats[1] < 0.6
