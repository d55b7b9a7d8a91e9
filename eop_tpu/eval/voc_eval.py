"""PASCAL VOC per-class AP evaluation.

Parity target: `/root/reference/yolox/evaluators/voc_eval.py:15-185`.
The *protocol* is the canonical py-faster-rcnn one and must match for
metric compatibility: greedy confidence-ordered matching with the VOC
inclusive-pixel (+1) IoU, difficult-object exclusion, and the VOC-07
11-point / VOC-10+ area-under-envelope AP metrics.  The implementation
here is restructured around that protocol rather than transcribed:
matching is grouped per image over one vectorized IoU matrix, and both
AP metrics are suffix-max formulations (equivalence vs the reference is
pinned by randomized parity tests in tests/test_voc.py).
"""

from __future__ import annotations

import os
import pickle
import xml.etree.ElementTree as ET

import numpy as np


def parse_rec(filename):
    """One VOC xml annotation file -> list of object dicts."""

    def _int(node, tag):
        n = node.find(tag)
        return 0 if n is None else int(n.text)

    out = []
    # findall, not iter: only top-level <object> elements count as GT
    # (recursive descent would double-count nested variants)
    for obj in ET.parse(filename).findall("object"):
        pose = obj.find("pose")
        box = obj.find("bndbox")
        out.append({
            "name": obj.find("name").text,
            "pose": "Unspecified" if pose is None else pose.text,
            "truncated": _int(obj, "truncated"),
            "difficult": _int(obj, "difficult"),
            "bbox": [int(float(box.find(t).text))
                     for t in ("xmin", "ymin", "xmax", "ymax")],
        })
    return out


def voc_ap(rec, prec, use_07_metric=False):
    """AP from a PR curve.

    VOC-07: mean over the 11 recall thresholds of the best precision at
    recall >= t.  Recall is nondecreasing, so "best precision at
    recall >= t" is a suffix maximum of the precision array — computed
    once and indexed via searchsorted instead of re-scanned per
    threshold.  VOC-10+: area under the monotone precision envelope.
    """
    rec = np.asarray(rec, np.float64)
    prec = np.asarray(prec, np.float64)
    if use_07_metric:
        suffix_best = np.maximum.accumulate(prec[::-1])[::-1]
        idx = np.searchsorted(rec, np.arange(0.0, 1.1, 0.1), side="left")
        return float(
            sum(suffix_best[i] for i in idx if i < rec.size) / 11.0
        )
    r = np.concatenate(([0.0], rec, [1.0]))
    p = np.concatenate(([0.0], prec, [0.0]))
    p = np.maximum.accumulate(p[::-1])[::-1]
    steps = np.flatnonzero(np.diff(r))
    return float(np.sum(np.diff(r)[steps] * p[steps + 1]))


def _iou_inclusive(dets: np.ndarray, gts: np.ndarray) -> np.ndarray:
    """Pairwise IoU [n_det, n_gt] under VOC's inclusive-pixel convention
    (box width = x2 - x1 + 1)."""
    lt = np.maximum(dets[:, None, :2], gts[None, :, :2])
    rb = np.minimum(dets[:, None, 2:], gts[None, :, 2:])
    wh = np.clip(rb - lt + 1.0, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]

    def area(b):
        return (b[:, 2] - b[:, 0] + 1.0) * (b[:, 3] - b[:, 1] + 1.0)

    return inter / (area(dets)[:, None] + area(gts)[None, :] - inter)


def _load_annotations(annopath, imagenames, cachedir):
    """Parse (or load the pickle cache of) every image's annotations."""
    os.makedirs(cachedir, exist_ok=True)
    cachefile = os.path.join(cachedir, "annots.pkl")
    if os.path.isfile(cachefile):
        with open(cachefile, "rb") as f:
            return pickle.load(f)
    recs = {name: parse_rec(annopath.format(name)) for name in imagenames}
    with open(cachefile, "wb") as f:
        pickle.dump(recs, f)
    return recs


def voc_eval(detpath, annopath, imagesetfile, classname, cachedir,
             ovthresh=0.5, use_07_metric=False):
    """(recall, precision, ap) for one class.

    ``detpath`` is a template for the per-class results file (rows:
    ``image_id score x1 y1 x2 y2``); returns the scalar triple
    ``(0.0, 0.0, 0.0)`` when that file is empty, like the reference.
    """
    with open(imagesetfile) as f:
        imagenames = [x.strip() for x in f]
    recs = _load_annotations(annopath, imagenames, cachedir)

    # this class's GT per image: (boxes [n,4], difficult [n]); npos
    # counts only non-difficult GT (the recall denominator)
    gt = {}
    npos = 0
    for name in imagenames:
        objs = [o for o in recs[name] if o["name"] == classname]
        boxes = np.array(
            [o["bbox"] for o in objs], np.float64
        ).reshape(len(objs), 4)
        diff = np.array([bool(o["difficult"]) for o in objs], bool)
        npos += int((~diff).sum())
        gt[name] = (boxes, diff)

    with open(detpath.format(classname)) as f:
        rows = [ln.strip().split(" ") for ln in f if ln.strip()]
    if not rows:
        return 0.0, 0.0, 0.0
    ids = np.array([r[0] for r in rows])
    conf = np.array([r[1] for r in rows], np.float64)
    det_boxes = np.array([r[2:6] for r in rows], np.float64)

    order = np.argsort(-conf)  # protocol tie behavior: plain argsort
    ids, det_boxes = ids[order], det_boxes[order]

    # greedy matching, grouped by image: GT claim state is per-image,
    # so images are independent as long as each image's detections are
    # visited in global confidence rank (flatnonzero keeps rank order)
    nd = ids.size
    tp = np.zeros(nd)
    fp = np.zeros(nd)
    for name in np.unique(ids):
        sel = np.flatnonzero(ids == name)
        gboxes, gdiff = gt[name]
        if not gboxes.size:
            fp[sel] = 1.0
            continue
        iou = _iou_inclusive(det_boxes[sel], gboxes)
        best = iou.argmax(axis=1)  # over ALL gt, claimed or difficult
        best_iou = iou[np.arange(sel.size), best]
        claimed = np.zeros(gboxes.shape[0], bool)
        for i, d in enumerate(sel):
            if best_iou[i] <= ovthresh:
                fp[d] = 1.0
            elif gdiff[best[i]]:
                pass  # difficult GT absorbs the det: neither tp nor fp
            elif claimed[best[i]]:
                fp[d] = 1.0  # duplicate detection of a matched GT
            else:
                claimed[best[i]] = True
                tp[d] = 1.0

    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(fp)
    rec = tp_cum / npos if npos > 0 else np.zeros_like(tp_cum)
    prec = tp_cum / np.maximum(tp_cum + fp_cum, np.finfo(np.float64).eps)
    return rec, prec, voc_ap(rec, prec, use_07_metric)
