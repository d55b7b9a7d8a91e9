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


# ------------------------------------------------- independent oracle (r5)
#
# A from-scratch AP implementation derived directly from the published
# pycocotools definition (greedy per-threshold matching + 101-point
# interpolated precision envelope), sharing NO code with the matcher or
# COCOeval (VERDICT r4 item 5: the previous differential base was written
# by the same author as the matcher under test).

_IOU_THRS = np.linspace(0.5, 0.95, 10)
_REC_THRS = np.linspace(0.0, 1.0, 101)
_AREAS = {"all": (0.0, 1e10), "small": (0.0, 32.0 ** 2),
          "medium": (32.0 ** 2, 96.0 ** 2), "large": (96.0 ** 2, 1e10)}


def _iou_xywh(d, g, crowd):
    """IoU of one dt box vs one gt box; crowd gts use dt-area union."""
    dx1, dy1, dw, dh = d
    gx1, gy1, gw, gh = g
    ix = max(0.0, min(dx1 + dw, gx1 + gw) - max(dx1, gx1))
    iy = max(0.0, min(dy1 + dh, gy1 + gh) - max(dy1, gy1))
    inter = ix * iy
    union = dw * dh if crowd else dw * dh + gw * gh - inter
    return inter / union if union > 0 else 0.0


def _naive_match_img(gts, dts, lo, hi):
    """One image+category: match per threshold.  Returns per-dt
    (score, tp[T], ignored[T]) arrays in score order plus the
    non-ignored-GT count.  A dt prefers its best-IoU NON-ignored
    available gt; only if none clears the bar may it take an ignored
    one.  Crowd gts stay available after being matched."""
    gIg = [bool(g.get("iscrowd", 0)) or not (lo <= g["area"] <= hi)
           for g in gts]
    crowd = [bool(g.get("iscrowd", 0)) for g in gts]
    order = sorted(range(len(dts)), key=lambda i: -dts[i]["score"])
    T, D = len(_IOU_THRS), len(order)
    tp = np.zeros((T, D), bool)
    ig = np.zeros((T, D), bool)
    for ti, t in enumerate(_IOU_THRS):
        taken = set()
        for di, idx in enumerate(order):
            d = dts[idx]
            bar = min(t, 1 - 1e-10)
            best, best_iou, best_is_ig = -1, bar, None
            for pass_ignored in (False, True):
                for gi, g in enumerate(gts):
                    if gIg[gi] != pass_ignored:
                        continue
                    if gi in taken and not crowd[gi]:
                        continue
                    v = _iou_xywh(d["bbox"], g["bbox"], crowd[gi])
                    if v > best_iou:
                        best, best_iou, best_is_ig = gi, v, gIg[gi]
                if best >= 0:
                    break  # found a non-ignored match; never prefer ignored
            if best >= 0:
                taken.add(best)
                tp[ti, di] = not best_is_ig
                ig[ti, di] = best_is_ig
            else:
                darea = d["bbox"][2] * d["bbox"][3]
                ig[ti, di] = not (lo <= darea <= hi)
    scores = np.array([dts[i]["score"] for i in order], np.float64)
    return scores, tp, ig, sum(1 for v in gIg if not v)


def _naive_stats(gt_dataset, dets):
    """The 12 COCO summary stats, straight from the definition."""
    img_ids = sorted(i["id"] for i in gt_dataset["images"])
    cat_ids = sorted(c["id"] for c in gt_dataset["categories"])
    gt_by, dt_by = {}, {}
    for a in gt_dataset["annotations"]:
        gt_by.setdefault((a["image_id"], a["category_id"]), []).append(a)
    for d in dets:
        dt_by.setdefault((d["image_id"], d["category_id"]), []).append(d)

    def area_eval(lo, hi):
        """-> {('ap'|'ar', maxDet): per-(cat,thr) arrays} averaged later."""
        ap = {m: [] for m in (1, 10, 100)}
        ar = {m: [] for m in (1, 10, 100)}
        for cat in cat_ids:
            per_img = []
            npig = 0
            for img in img_ids:
                gts = gt_by.get((img, cat), [])
                dts = sorted(dt_by.get((img, cat), []),
                             key=lambda d: -d["score"])[:100]
                s, tp, ig, n = _naive_match_img(gts, dts, lo, hi)
                per_img.append((s, tp, ig))
                npig += n
            if npig == 0:
                continue
            for m in (1, 10, 100):
                scores = np.concatenate([p[0][:m] for p in per_img])
                tps = np.concatenate([p[1][:, :m] for p in per_img], axis=1)
                igs = np.concatenate([p[2][:, :m] for p in per_img], axis=1)
                o = np.argsort(-scores, kind="mergesort")
                tps, igs = tps[:, o], igs[:, o]
                keep = ~igs
                aps, ars = [], []
                for ti in range(len(_IOU_THRS)):
                    t_keep = keep[ti]
                    tp_c = np.cumsum(tps[ti][t_keep])
                    n_dt = len(tp_c)
                    fp_c = np.arange(1, n_dt + 1) - tp_c
                    rec = tp_c / npig
                    prc = tp_c / np.maximum(tp_c + fp_c, 1e-12)
                    # precision envelope (max to the right)
                    for i in range(n_dt - 2, -1, -1):
                        prc[i] = max(prc[i], prc[i + 1])
                    idx = np.searchsorted(rec, _REC_THRS, side="left")
                    q = np.where(idx < n_dt, prc[np.minimum(idx, max(n_dt - 1, 0))],
                                 0.0) if n_dt else np.zeros(101)
                    aps.append(q.mean())
                    ars.append(rec[-1] if n_dt else 0.0)
                ap[m].append(np.asarray(aps))
                ar[m].append(np.asarray(ars))
        return ap, ar

    def mean_or_neg1(chunks):
        if not chunks:
            return -1.0
        return float(np.mean(np.stack(chunks)))

    ap_all, ar_all = area_eval(*_AREAS["all"])
    ap_s, ar_s = area_eval(*_AREAS["small"])
    ap_m, ar_m = area_eval(*_AREAS["medium"])
    ap_l, ar_l = area_eval(*_AREAS["large"])
    stats = np.zeros(12)
    stats[0] = mean_or_neg1(ap_all[100])
    stats[1] = mean_or_neg1([a[0:1] for a in ap_all[100]])   # IoU .5
    stats[2] = mean_or_neg1([a[5:6] for a in ap_all[100]])   # IoU .75
    stats[3] = mean_or_neg1(ap_s[100])
    stats[4] = mean_or_neg1(ap_m[100])
    stats[5] = mean_or_neg1(ap_l[100])
    stats[6] = mean_or_neg1(ar_all[1])
    stats[7] = mean_or_neg1(ar_all[10])
    stats[8] = mean_or_neg1(ar_all[100])
    stats[9] = mean_or_neg1(ar_s[100])
    stats[10] = mean_or_neg1(ar_m[100])
    stats[11] = mean_or_neg1(ar_l[100])
    return stats


def _rand_scenario(rng, n_imgs=3, n_cats=2, max_gt=6, max_dt=8,
                   tie_scores=False, crowd_p=0.2, big_dt=False):
    images, annotations = [], []
    aid = 1
    cats = list(range(1, n_cats + 1))
    for img_id in range(1, n_imgs + 1):
        images.append({"id": img_id, "width": 640, "height": 640,
                       "file_name": f"{img_id}.jpg"})
        for _ in range(rng.randint(0, max_gt + 1)):
            w, h = rng.randint(8, 200, 2)
            x = rng.randint(0, 640 - w)
            y = rng.randint(0, 640 - h)
            annotations.append({
                "id": aid, "image_id": img_id,
                "category_id": int(rng.choice(cats)),
                "bbox": [float(x), float(y), float(w), float(h)],
                "area": float(w * h),
                "iscrowd": int(rng.rand() < crowd_p),
            })
            aid += 1
    gt_dataset = {
        "images": images, "annotations": annotations,
        "categories": [{"id": c, "name": str(c)} for c in cats],
    }
    dets = []
    score_pool = [0.9, 0.8, 0.7, 0.6] if tie_scores else None
    # big_dt guarantees >100 per image so the maxDets=100 truncation is
    # actually on the differential path
    n_dets = rng.randint(105, 131) if big_dt else rng.randint(1, max_dt + 1)
    for img_id in range(1, n_imgs + 1):
        for _ in range(n_dets):
            base = rng.choice(annotations)["bbox"] if annotations and \
                rng.rand() < 0.6 else None
            if base is not None:
                jit = rng.randint(-20, 20, 4)
                bbox = [float(base[0] + jit[0]), float(base[1] + jit[1]),
                        float(max(4, base[2] + jit[2])),
                        float(max(4, base[3] + jit[3]))]
            else:
                w, h = rng.randint(8, 200, 2)
                bbox = [float(rng.randint(0, 640 - w)),
                        float(rng.randint(0, 640 - h)),
                        float(w), float(h)]
            score = (float(rng.choice(score_pool)) if tie_scores
                     else float(np.round(rng.rand(), 6)))
            dets.append({"image_id": img_id,
                         "category_id": int(rng.choice(cats)),
                         "bbox": bbox, "score": score})
    return gt_dataset, dets


def _eval_dataset(gt_dataset, dets):
    gt = COCO()
    gt.dataset = gt_dataset
    gt.createIndex()
    if not dets:
        dt = gt.loadRes([])
    else:
        dt = gt.loadRes(dets)
    e = COCOeval(gt, dt, "bbox")
    e.evaluate()
    e.accumulate()
    e.summarize()
    return e.stats


@pytest.mark.parametrize("seed,kw", [
    (0, {}),
    (1, {"tie_scores": True}),
    (2, {"crowd_p": 0.5}),
    (3, {"n_imgs": 1, "n_cats": 3}),
    (4, {"big_dt": True, "n_imgs": 1, "n_cats": 1}),  # >100 dts: maxDets
    (5, {"max_gt": 2, "max_dt": 3}),
    (6, {"tie_scores": True, "crowd_p": 0.4}),
])
def test_fuzz_vs_independent_oracle(seed, kw):
    """End-to-end COCOeval (C++ matcher + accumulate + summarize) vs the
    from-definition oracle above, including crowds, score ties, area
    ranges, multi-category images and maxDets truncation."""
    rng = np.random.RandomState(seed)
    gt_dataset, dets = _rand_scenario(rng, **kw)
    got = _eval_dataset(gt_dataset, dets)
    want = _naive_stats(gt_dataset, dets)
    np.testing.assert_allclose(got, want, atol=1e-9,
                               err_msg=f"seed {seed} kw {kw}")


# --------------------------------------------- known-value edge cases (r5)


def test_maxdets_ar_truncation():
    """AR@1 sees only the top-scoring det per image: a leading FP zeroes
    it while AR@10 recovers both GTs; AP50 = 2/3 (FP, TP, TP)."""
    gt = _make_gt({1: [(10, 10, 50, 50, 1), (300, 300, 50, 50, 1)]})
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [500, 500, 40, 40],
         "score": 0.95},
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 50],
         "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [300, 300, 50, 50],
         "score": 0.85},
    ]
    stats = _eval(gt, dets)
    assert stats[6] == pytest.approx(0.0)       # AR@1: top det is the FP
    assert stats[7] == pytest.approx(1.0)       # AR@10
    assert stats[1] == pytest.approx(2 / 3, abs=1e-9)


def test_equal_scores_resolve_by_submission_order():
    """pycocotools breaks score ties by stable sort (submission order);
    FP-before-TP at the same score gives AP50 = 0.5, TP-before-FP gives
    1.0 (the envelope forgives trailing FPs)."""
    gt_boxes = {1: [(10, 10, 50, 50, 1)]}
    fp = {"image_id": 1, "category_id": 1, "bbox": [400, 400, 50, 50],
          "score": 0.5}
    tp = {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 50],
          "score": 0.5}
    assert _eval(_make_gt(dict(gt_boxes)), [fp, tp])[1] == \
        pytest.approx(0.5, abs=1e-9)
    assert _eval(_make_gt(dict(gt_boxes)), [tp, fp])[1] == \
        pytest.approx(1.0, abs=1e-9)


def test_area_range_boundaries_inclusive():
    """pycocotools range checks are inclusive on both ends: a 32x32 box
    (area 1024) counts for BOTH the small and medium buckets, 96x96
    (9216) for BOTH medium and large."""
    gt = _make_gt({1: [(0, 0, 32, 32, 1), (300, 300, 96, 96, 1)]})
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 32, 32],
         "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [300, 300, 96, 96],
         "score": 0.8},
    ]
    stats = _eval(gt, dets)
    assert stats[3] == pytest.approx(1.0)   # small includes 1024
    assert stats[4] == pytest.approx(1.0)   # medium includes 1024 AND 9216
    assert stats[5] == pytest.approx(1.0)   # large includes 9216


def test_multicategory_mean():
    """mAP averages over categories with GTs: cat1 perfect, cat2 missed
    -> 0.5; a category with no GTs anywhere is excluded, not zeroed."""
    gt = _make_gt({1: [(10, 10, 50, 50, 1), (200, 200, 50, 50, 2)]},
                  cats=(1, 2, 3))
    dets = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 50],
             "score": 0.9}]
    stats = _eval(gt, dets)
    assert stats[0] == pytest.approx(0.5)
    assert stats[1] == pytest.approx(0.5)


def test_crowd_and_ignore_interaction():
    """A det overlapping only a crowd GT is ignored (neither TP nor FP);
    a clean FP above the TP still halves AP; the crowd GT itself never
    enters the recall denominator."""
    gt = _make_gt({1: [(0, 0, 100, 100, 1), (300, 300, 100, 100, 1)]})
    gt.dataset["annotations"][1]["iscrowd"] = 1
    gt.createIndex()
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [500, 500, 40, 40],
         "score": 0.95},                                   # FP
        {"image_id": 1, "category_id": 1, "bbox": [310, 310, 60, 60],
         "score": 0.9},                                    # inside crowd
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 100, 100],
         "score": 0.8},                                    # TP
    ]
    stats = _eval(gt, dets)
    assert stats[1] == pytest.approx(0.5, abs=1e-9)
    assert stats[8] == pytest.approx(1.0)  # AR over the 1 real GT
