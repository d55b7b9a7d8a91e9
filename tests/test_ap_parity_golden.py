"""Multi-image AP-parity golden vs the reference pipeline (VERDICT item 2).

Builds a 12-image golden set from the reference's COCO fixture — the raw
image, its vertical-offset re-renders (−100..+100 step 50), and sector
(fisheye) distortions (Θ = 30/50/70/90 on offset 0, Θ = 60 on ±50) — then
runs BOTH detection pipelines end-to-end with the same weights:

* reference: the torch model code from `/root/reference/yolox/models/` +
  the reference's own `postprocess` (`yolox/utils/boxes.py:32-73`,
  class-agnostic as in `demo_featuremap.py:121-123`), with
  `torchvision.ops.nms` provided as an exact greedy torch implementation
  (torchvision is absent from this image);
* ours: jitted forward -> `inference_outputs` -> `postprocess_bbox`.

Weights are shared via the torch->flax importer.  The random init is
re-scaled (kaiming * 0.7) so the untrained net emits a non-degenerate,
non-saturated score distribution (~80 candidates above conf on the
fixture; default torch init attenuates all logits to the prior bias).

Asserts per-detection agreement (same count, per-box IoU >= 0.99, same
class, score within conv tolerance) and COCO AP equality <= 1e-3 through
the full COCOeval pipeline on every sweep.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

import ref_loader

FIXTURE_JSON = "/root/reference/yolox/test_data/000000130566.json"
TSIZE = (320, 320)
CONF = 0.1
NMS_THR = 0.45
WEIGHT_SCALE = 0.7  # kaiming * this: signal propagates without saturating


def _torch_greedy_nms(boxes, scores, iou_threshold):
    """Exact torchvision.ops.nms semantics in pure torch: greedy by score,
    suppress IoU strictly greater than the threshold."""
    order = torch.argsort(scores, descending=True)
    keep = []
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = torch.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = torch.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = torch.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = torch.minimum(boxes[i, 3], boxes[:, 3])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (area_i + areas - inter)
        suppressed |= iou > iou_threshold
        suppressed[i] = True  # processed
    return torch.as_tensor(keep, dtype=torch.int64)


def _build_ref_model():
    pafpn = ref_loader.ref_module("yolo_pafpn")
    head = ref_loader.ref_module("yolo_head")
    yolox_mod = ref_loader.ref_module("yolox")
    torch.manual_seed(0)
    tm = yolox_mod.YOLOX(
        pafpn.YOLOPAFPN("darknet", 0.33, 0.25),
        head.YOLOXHead(80, 0.25),
    )
    g = torch.Generator().manual_seed(42)
    for m in tm.modules():
        if isinstance(m, nn.Conv2d):
            nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                    nonlinearity="relu")
            with torch.no_grad():
                m.weight.mul_(WEIGHT_SCALE)
            if m.bias is not None:
                nn.init.normal_(m.bias, 0, 0.02)
        if isinstance(m, nn.BatchNorm2d):
            nn.init.normal_(m.weight, 1.0, 0.1)
            nn.init.normal_(m.bias, 0.0, 0.1)
            with torch.no_grad():
                m.running_mean.normal_(0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    ref_loader.apply_init_yolo(tm)
    tm.head.initialize_biases(1e-2)
    # tame the reg head: with unit-scale logits exp-decode emits degenerate
    # boxes (1e10 px wide) where tiny conv noise dominates IoU; scaled
    # weights + w/h biases near the fixture object's log-scale keep decoded
    # geometry realistic and make some detections true positives (so the
    # AP parity below is non-vacuous)
    with torch.no_grad():
        for conv in tm.head.reg_preds:
            conv.weight.mul_(0.15)
            conv.bias.zero_()
            conv.bias[2] = 3.0   # log w
            conv.bias[3] = 1.6   # log h
    return tm.eval()


def _letterbox(img):
    """The reference ValTransform letterbox (pad 114, top-left aligned)."""
    r = min(TSIZE[0] / img.shape[0], TSIZE[1] / img.shape[1])
    resized = cv2.resize(
        img, (int(img.shape[1] * r), int(img.shape[0] * r)),
        interpolation=cv2.INTER_LINEAR,
    ).astype(np.uint8)
    padded = np.ones((*TSIZE, 3), np.uint8) * 114
    padded[: resized.shape[0], : resized.shape[1]] = resized
    return padded.astype(np.float32), r


def _ref_detect(tm, padded):
    """Reference pipeline: model -> reference postprocess (class-agnostic).
    Returns [N, 7] rows (x1, y1, x2, y2, obj, cls_conf, cls)."""
    ref_loader.install_stubs()
    import sys

    sys.modules["torchvision"].ops.nms = _torch_greedy_nms
    boxes_mod = sys.modules["_ref_yolox_boxes"]
    x = torch.from_numpy(padded.transpose(2, 0, 1)[None].copy())
    with torch.no_grad():
        dec, _ = tm(x)
        out = boxes_mod.postprocess(dec, 80, CONF, NMS_THR,
                                    class_agnostic=True)
    if out[0] is None:
        return np.zeros((0, 7), np.float32)
    return out[0].numpy()


@pytest.fixture(scope="module")
def golden_setup():
    from eop_tpu.models import YOLOX, inference_outputs
    from eop_tpu.tools.featuremap import (
        ImageDistortion,
        get_img_info,
        get_img_mask,
    )
    from eop_tpu.utils.torch_import import (
        convert_state_dict,
        merge_into_variables,
    )

    tm = _build_ref_model()

    fm = YOLOX(depth=0.33, width=0.25, num_classes=80)
    template = fm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *TSIZE, 3), jnp.float32), False
    )
    variables, report = merge_into_variables(
        template,
        convert_state_dict(
            {k: v.numpy() for k, v in tm.state_dict().items()}
        ),
    )
    assert not report["missing"]

    # ---- the 12-image golden set ----
    coco, targets, ori_img, ori_h, ori_w = get_img_info(FIXTURE_JSON)
    images, gt_boxes = [("raw", ori_img, _ann_bbox(targets[0]))], []
    dist = ImageDistortion()
    canvases = {}
    for offset in range(-100, 150, 50):
        canvas, _, gt_box, mask = get_img_mask(
            offset, ori_img, ori_h, ori_w, targets, coco
        )
        canvases[offset] = (canvas, mask)
        bbox = [float(gt_box[0, 0]), float(gt_box[0, 1]),
                float(gt_box[0, 2] - gt_box[0, 0]),
                float(gt_box[0, 3] - gt_box[0, 1])]
        images.append((f"off{offset}", canvas, bbox))
    for theta, offset in [(30, 0), (50, 0), (70, 0), (90, 0),
                          (60, -50), (60, 50)]:
        canvas, mask = canvases[offset]
        warped, bbox = dist.sector_distort(canvas, mask, theta=theta,
                                          reference_parity=True)
        images.append(
            (f"th{theta}_off{offset}", warped,
             [float(v) for v in (bbox or [0, 0, 1, 1])])
        )
    assert len(images) == 12

    # ---- second source image: a synthetic multi-object scene (the r2
    # golden set derived every variant from one COCO photo) ----
    scene = np.full_like(ori_img, 114)
    scene_mask = np.zeros(ori_img.shape[:2], np.uint8)
    cx, cy = ori_w // 3, ori_h // 2
    cv2.ellipse(scene, (cx, cy), (60, 40), 20, 0, 360, (60, 180, 230), -1)
    cv2.ellipse(scene_mask, (cx, cy), (60, 40), 20, 0, 360, 1, -1)
    rx, ry = 2 * ori_w // 3, ori_h // 4
    cv2.rectangle(scene, (rx, ry), (rx + 90, ry + 70), (200, 90, 40), -1)
    cv2.rectangle(scene_mask, (rx, ry), (rx + 90, ry + 70), 1, -1)
    cv2.circle(scene, (ori_w // 2, 3 * ori_h // 4), 35, (30, 220, 90), -1)
    cv2.circle(scene_mask, (ori_w // 2, 3 * ori_h // 4), 35, 1, -1)
    ys, xs = np.nonzero(scene_mask)
    images.append(("scene_raw", scene,
                   [float(xs.min()), float(ys.min()),
                    float(xs.max() - xs.min()), float(ys.max() - ys.min())]))
    warped2, bbox2 = dist.sector_distort(
        scene, scene_mask[..., None].repeat(3, axis=2), theta=60,
        reference_parity=True,
    )
    images.append(("scene_th60", warped2,
                   [float(v) for v in (bbox2 or [0, 0, 1, 1])]))
    assert len(images) == 14

    @jax.jit
    def forward(imgs):
        head_outs, _ = fm.apply(variables, imgs, False)
        return inference_outputs(head_outs)

    return tm, forward, images


def _ann_bbox(target):
    x, y, w, h = target["bbox"]
    return [float(x), float(y), float(w), float(h)]


def _ours_detect(forward, padded):
    from eop_tpu.eval.postprocess import postprocess_bbox

    decoded = forward(jnp.asarray(padded[None]))
    dets = postprocess_bbox(
        jnp.asarray(decoded, jnp.float32), 80, CONF, NMS_THR,
        class_agnostic=True,
    )
    rows = np.asarray(dets.rows[0])
    valid = np.asarray(dets.valid[0]).astype(bool)
    return rows[valid]


def _match_sets(ref_rows, our_rows):
    """Greedy best-IoU matching between the two detection sets."""
    from eop_tpu.ops.boxes import bboxes_iou

    if len(ref_rows) == 0 or len(our_rows) == 0:
        return []
    iou = np.asarray(
        bboxes_iou(jnp.asarray(ref_rows[:, :4]),
                   jnp.asarray(our_rows[:, :4]), xyxy=True)
    )
    pairs = []
    used = set()
    for i in np.argsort(-ref_rows[:, 4] * ref_rows[:, 5]):
        j = int(np.argmax(np.where(
            [c not in used for c in range(iou.shape[1])], iou[i], -1.0
        )))
        used.add(j)
        pairs.append((int(i), j, float(iou[i, j])))
    return pairs


@pytest.fixture(scope="module")
def detections(golden_setup):
    tm, forward, images = golden_setup
    per_image = []
    for name, img, gt_bbox in images:
        padded, ratio = _letterbox(img)
        ref_rows = _ref_detect(tm, padded)
        our_rows = _ours_detect(forward, padded)
        per_image.append((name, ratio, img.shape[:2], gt_bbox,
                          ref_rows, our_rows))
    return per_image


def test_per_detection_parity(detections):
    total = 0
    for name, _, _, _, ref_rows, our_rows in detections:
        assert len(ref_rows) == len(our_rows), (
            f"{name}: {len(ref_rows)} ref vs {len(our_rows)} ours"
        )
        total += len(ref_rows)
        for i, j, iou in _match_sets(ref_rows, our_rows):
            assert iou >= 0.99, (
                f"{name}: box {i} IoU {iou:.4f} "
                f"ref={ref_rows[i, :4]} ours={our_rows[j, :4]}"
            )
            assert int(ref_rows[i, 6]) == int(our_rows[j, 6]), (
                f"{name}: class mismatch on box {i}"
            )
            # obj*cls score within the env's conv precision
            np.testing.assert_allclose(
                ref_rows[i, 4] * ref_rows[i, 5],
                our_rows[j, 4] * our_rows[j, 5],
                atol=7e-3,
                err_msg=f"{name}: score mismatch on box {i}",
            )
    assert total >= 100, f"golden set too sparse ({total} detections)"


def _to_coco_dts(rows, ratio, image_id, id_trans):
    dts = []
    for row in rows:
        x1, y1, x2, y2 = (float(v) / ratio for v in row[:4])
        dts.append({
            "image_id": image_id,
            "category_id": id_trans[int(row[6])],
            "bbox": [x1, y1, x2 - x1, y2 - y1],
            "score": float(row[4] * row[5]),
        })
    return dts


def test_ap_parity(detections):
    from eop_tpu.data.coco_api import COCO
    from eop_tpu.data.labels24p import COCO_ID2IDX
    from eop_tpu.eval.coco_eval import COCOeval

    import json

    with open(FIXTURE_JSON) as f:
        first_cat = json.load(f)["annotations"][0]["category_id"]
    id_trans = {v: k for k, v in COCO_ID2IDX.items()}
    gt = {"images": [], "annotations": [],
          "categories": [{"id": c, "name": str(c)}
                         for c in id_trans.values()]}
    ref_dts, our_dts = [], []
    for idx, (name, ratio, (h, w), gt_bbox, ref_rows, our_rows) in enumerate(
        detections
    ):
        img_id = idx + 1
        gt["images"].append(
            {"id": img_id, "height": int(h), "width": int(w),
             "file_name": f"{name}.png"}
        )
        gt["annotations"].append(
            {"id": img_id, "image_id": img_id,
             "category_id": first_cat,
             "bbox": gt_bbox, "area": float(gt_bbox[2] * gt_bbox[3]),
             "iscrowd": 0}
        )
        ref_dts += _to_coco_dts(ref_rows, ratio, img_id, id_trans)
        our_dts += _to_coco_dts(our_rows, ratio, img_id, id_trans)

    coco_gt = COCO()
    coco_gt.dataset = gt
    coco_gt.createIndex()

    stats = {}
    for tag, dts in (("ref", ref_dts), ("ours", our_dts)):
        e = COCOeval(coco_gt, coco_gt.loadRes([dict(d) for d in dts]),
                     "bbox")
        e.evaluate()
        e.accumulate()
        e.summarize()
        stats[tag] = e.stats
        # class-agnostic (localization) AP: the demo's NMS is class-
        # agnostic and an untrained net never guesses the right class, so
        # collapse categories to make the AP comparison non-vacuous.
        ag = [dict(d, category_id=first_cat) for d in dts]
        e = COCOeval(coco_gt, coco_gt.loadRes(ag), "bbox")
        e.evaluate()
        e.accumulate()
        e.summarize()
        stats[tag + "_agnostic"] = e.stats
    print(f"AP ref={stats['ref'][:2]} ours={stats['ours'][:2]} "
          f"agnostic ref={stats['ref_agnostic'][:2]} "
          f"ours={stats['ours_agnostic'][:2]}")
    np.testing.assert_allclose(stats["ours"], stats["ref"], atol=1e-3)
    np.testing.assert_allclose(
        stats["ours_agnostic"], stats["ref_agnostic"], atol=1e-3
    )
    assert stats["ref_agnostic"][1] > 0, (
        "class-agnostic AP50 is zero — the golden parity claim is vacuous"
    )
