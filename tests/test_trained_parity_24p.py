"""Trained-weight pipeline parity: OUR trained 24p checkpoint driving the
REFERENCE's torch code.

Round 2's AP-parity goldens ran on doctored random inits; this closes the
gap with a model actually trained by this framework (in-test overfit to a
tiny synthetic set, producing realistic high-confidence detections, or a
real checkpoint via $EOP_TRAINED_VARS_24P), exported to a torch
state_dict (`eop_tpu/utils/torch_export.py`), loaded *strict* into the
reference's model code (`/root/reference/yolox_24p/models/yolo_pafpn.py`,
`yolo_head_24p.py:199-256`) and pushed through the reference's own
postprocess (`yolox_24p/utils/boxes.py:29-99`, θ·cosθ quirk and all).

Asserts:
1. the exporter's torch key-set matches the reference model exactly
   (strict load) and survives an import roundtrip bit-identically;
2. per-detection agreement (count, class, score, polygon geometry) on
   every val image at realistic score distributions;
3. per-class AP agreement — non-vacuous: multiple classes, confident
   scores, no class-agnostic collapse.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

import ref_loader
from eop_tpu.data.coco24p import COCO24PDataset, TrainTransform24P
from eop_tpu.utils import torch_import as ti
from eop_tpu.utils.torch_export import variables_to_state_dict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEPTH, WIDTH, NUM_CLASSES, IMG = 0.33, 0.25, 3, 96
CONF, NMS = 0.30, 0.30


# ---------------------------------------------------------------------------
# a genuinely trained model (overfit a tiny synthetic set on CPU)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity24p")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synth_datasets.py"),
         "24p", "--out", str(root), "--size", str(IMG), "--n", "8"],
        check=True, cwd=REPO,
    )
    return root


@pytest.fixture(scope="module")
def trained(synth):
    from eop_tpu.losses.loss_24p import Loss24PConfig
    from eop_tpu.models import YOLOX, init_model
    from eop_tpu.train.optimizer import build_sgd
    from eop_tpu.train.steps import create_train_state, make_train_step_24p

    model = YOLOX(depth=DEPTH, width=WIDTH, num_classes=NUM_CLASSES,
                  reg_dim=26)

    override = os.environ.get("EOP_TRAINED_VARS_24P")
    if override:
        variables = dict(np.load(override, allow_pickle=True)["vars"].item())
        return model, variables

    ds = COCO24PDataset(
        data_dir=str(synth / "imgs"), label_dir=str(synth / "labels"),
        img_size=(IMG, IMG), preproc=TrainTransform24P(max_labels=50),
    )
    batch = [ds[i] for i in range(len(ds))]
    images = jnp.asarray(np.stack([b[0] for b in batch]))
    labels = jnp.asarray(np.stack([b[1] for b in batch]))

    tx = build_sgd(0.02, momentum=0.9, weight_decay=0.0, nesterov=True)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        jnp.zeros((1, IMG, IMG, 3), jnp.float32),
        use_ema=False, with_dwa=True,
    )
    step = jax.jit(make_train_step_24p(
        model, tx, Loss24PConfig(num_classes=NUM_CLASSES), ema_decay=None,
    ))
    for i in range(300):
        state, metrics = step(state, images, labels, jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["total_loss"]))
    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    return model, variables


# ---------------------------------------------------------------------------
# both pipelines over the val images
# ---------------------------------------------------------------------------

def _our_detections(model, variables, padded_batch):
    from eop_tpu.eval.postprocess import postprocess_24p
    from eop_tpu.models import inference_outputs

    @jax.jit
    def infer(x):
        head_outs, _ = model.apply(variables, x, train=False)
        decoded = inference_outputs(head_outs, reg_dim=26,
                                    out_dtype=jnp.float32)
        return postprocess_24p(
            decoded, num_classes=NUM_CLASSES, conf_thre=CONF, nms_thre=NMS,
            reference_parity=True,  # the reference's θ·cosθ NMS rectangles
        )

    dets = jax.device_get(infer(padded_batch))
    per_image = []
    for rows, valid in zip(np.asarray(dets.rows), np.asarray(dets.valid)):
        per_image.append(rows[valid.astype(bool)])
    return per_image  # rows: x, y, r1..r24, obj, cls_conf, cls


def _ref_detections(torch_model, padded_batch):
    boxes24 = ref_loader.ref_24p_boxes()
    # the reference postprocess routes NMS through torchvision; supply a
    # faithful greedy CPU implementation
    import torchvision

    def greedy_nms(b, s, thr):
        order = torch.argsort(s, descending=True)
        keep, alive = [], torch.ones(len(s), dtype=torch.bool)
        x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        area = (x2 - x1) * (y2 - y1)
        for i in order.tolist():
            if not alive[i]:
                continue
            keep.append(i)
            xx1 = torch.maximum(x1[i], x1)
            yy1 = torch.maximum(y1[i], y1)
            xx2 = torch.minimum(x2[i], x2)
            yy2 = torch.minimum(y2[i], y2)
            inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
            iou = inter / (area[i] + area - inter)
            alive &= iou <= thr
            alive[i] = False
        return torch.tensor(keep, dtype=torch.long)

    def greedy_batched_nms(b, s, idxs, thr):
        picked = []
        for cls in torch.unique(idxs):
            members = (idxs == cls).nonzero().flatten()
            picked.append(members[greedy_nms(b[members], s[members], thr)])
        keep = torch.cat(picked) if picked else torch.zeros(0, dtype=torch.long)
        return keep[torch.argsort(s[keep], descending=True)]

    torchvision.ops.nms = greedy_nms
    torchvision.ops.batched_nms = greedy_batched_nms
    per_image = []
    with torch.no_grad():
        x = torch.from_numpy(
            np.ascontiguousarray(padded_batch.transpose(0, 3, 1, 2))
        )
        decoded = torch_model(x, train=False)
        # one image per call: the reference postprocess overwrites its
        # cos/sin tables inside the per-image loop (boxes.py:57-58), so it
        # only works at B=1 — exactly how show_24p drives it
        for i in range(decoded.shape[0]):
            (out,) = boxes24.postprocess(
                decoded[i: i + 1].clone(), NUM_CLASSES,
                conf_thre=CONF, nms_thre=NMS,
            )
            per_image.append(
                np.zeros((0, 29), np.float32) if out is None else out.numpy()
            )
    return per_image  # rows: x, y, r1..r24, obj, cls_conf, cls


@pytest.fixture(scope="module")
def detections(trained, synth):
    model, variables = trained

    # strict torch load: key-set must match the reference model exactly
    sd = variables_to_state_dict(variables)
    torch_model = ref_loader.ref_24p_model(DEPTH, WIDTH, NUM_CLASSES)
    torch_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )

    # roundtrip self-check: export -> import reproduces every leaf
    merged, report = ti.merge_into_variables(
        jax.tree.map(np.asarray, variables), ti.convert_state_dict(sd)
    )
    assert not report["missing"] and not report["unexpected"], report
    for (pa, va), (pb, vb) in zip(
        sorted(ti._flatten(jax.tree.map(np.asarray, variables))),
        sorted(ti._flatten(merged)),
    ):
        assert pa == pb and np.array_equal(va, vb), pa

    ds = COCO24PDataset(
        data_dir=str(synth / "imgs"), label_dir=str(synth / "labels"),
        img_size=(IMG, IMG), preproc=TrainTransform24P(max_labels=50),
    )
    padded = np.stack([ds[i][0] for i in range(len(ds))]).astype(np.float32)
    ours = _our_detections(model, variables, padded)
    refs = _ref_detections(torch_model, padded)
    return ds, ours, refs


def test_trained_detection_parity(detections):
    _, ours, refs = detections
    total = 0
    for i, (a, b) in enumerate(zip(ours, refs)):
        assert len(a) == len(b), (
            f"image {i}: ours {len(a)} dets vs reference {len(b)}"
        )
        total += len(a)
        if len(a) == 0:
            continue
        # align by (class, center) — NMS order may differ
        order_a = np.lexsort((a[:, 0], a[:, 1], a[:, 28]))
        order_b = np.lexsort((b[:, 0], b[:, 1], b[:, 28]))
        a, b = a[order_a], b[order_b]
        np.testing.assert_array_equal(a[:, 28], b[:, 28],
                                      err_msg=f"image {i} classes")
        # fp32 conv-impl divergence (XLA vs torch CPU) accumulates to
        # ~3e-3 on sigmoid scores over this depth; ranking is unchanged
        np.testing.assert_allclose(a[:, 26] * a[:, 27], b[:, 26] * b[:, 27],
                                   atol=5e-3, err_msg=f"image {i} scores")
        # geometry: the two fp32 pipelines can keep DIFFERENT near-tied
        # anchors for the same object (observed: all 24 radii shifting
        # ~1 px together, flipping with the XLA compile-cache state), so
        # exact row equality is the wrong assertion — require
        # detection-level agreement: centers within 2 px and radial
        # polygon overlap > 0.85 (the 24-gon area is ∝ Σ r_k·r_{k+1} at
        # fixed ray angles, so min-gon/max-gon area is a per-ray IoU)
        np.testing.assert_allclose(a[:, 0:2], b[:, 0:2], atol=2.0,
                                   err_msg=f"image {i} centers")
        ra, rb = a[:, 2:26], b[:, 2:26]

        def _gon_area(r):
            return np.sum(r * np.roll(r, -1, axis=1), axis=1)

        iou = _gon_area(np.minimum(ra, rb)) / _gon_area(np.maximum(ra, rb))
        assert (iou > 0.85).all(), (
            f"image {i}: radial polygon IoU {iou.min():.3f} — the two "
            "pipelines describe different objects"
        )
    # realistic score distribution: the trained model must actually detect
    assert total >= len(ours), f"only {total} detections over {len(ours)} images"
    all_scores = np.concatenate(
        [a[:, 26] * a[:, 27] for a in ours if len(a)]
    )
    assert all_scores.max() > 0.5, "no confident detections — not a trained model"


def _ap_per_class(ds, per_image_dets):
    """AP50 per class via our COCOeval over the txt-label ground truth."""
    from eop_tpu.eval.evaluator_24p import polygon_rows_to_xyxy
    from eop_tpu.eval.coco_eval import COCOeval
    from eop_tpu.data.coco_api import COCO

    images, anns, dts = [], [], []
    ann_id = 1
    for idx in range(len(ds)):
        img_id = idx + 1
        images.append({"id": img_id, "width": IMG, "height": IMG,
                       "file_name": f"{idx}.jpg"})
        gt = ds.load_anno(idx)  # [N, 51] normalized cords
        for row in np.atleast_2d(gt):
            xs, ys = row[3::2] * IMG, row[4::2] * IMG
            x1, y1 = float(xs.min()), float(ys.min())
            w, h = float(xs.max() - x1), float(ys.max() - y1)
            anns.append({
                "id": ann_id, "image_id": img_id,
                "category_id": int(row[0]) + 1,
                "bbox": [x1, y1, w, h], "area": w * h, "iscrowd": 0,
            })
            ann_id += 1
        for det in per_image_dets[idx]:
            box = polygon_rows_to_xyxy(det[None])[0]
            dts.append({
                "image_id": img_id, "category_id": int(det[28]) + 1,
                "bbox": [float(box[0]), float(box[1]),
                         float(box[2] - box[0]), float(box[3] - box[1])],
                "score": float(det[26] * det[27]),
            })
    gt = COCO()
    gt.dataset = {
        "images": images, "annotations": anns,
        "categories": [{"id": c + 1, "name": str(c)}
                       for c in range(NUM_CLASSES)],
    }
    gt.createIndex()
    if not dts:
        return np.zeros(NUM_CLASSES)
    ev = COCOeval(gt, gt.loadRes(dts), "bbox")
    ev.evaluate()
    ev.accumulate()
    # precision [T, R, K, A, M]; AP50 = T index 0, area all, maxDet last
    prec = ev.eval["precision"][0, :, :, 0, -1]
    return np.array([
        prec[:, k][prec[:, k] > -1].mean() if (prec[:, k] > -1).any()
        else float("nan")
        for k in range(NUM_CLASSES)
    ])


def test_trained_ap_parity(detections):
    ds, ours, refs = detections
    ap_ours = _ap_per_class(ds, ours)
    ap_refs = _ap_per_class(ds, refs)
    # per-class AP, no class-agnostic collapse; identical detection sets
    # give identical AP curves
    np.testing.assert_allclose(ap_ours, ap_refs, atol=1e-6,
                               err_msg=f"{ap_ours} vs {ap_refs}")
    # the trained model must score on at least one class for the AP
    # comparison to be non-vacuous
    assert np.nanmax(ap_ours) > 0.5, ap_ours
