"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. head.py — BOTH reg convs' BatchNorms must train (update batch stats)
   in training mode, like the reference head.
2. trainer resume ordering — no_aug must be computed from the *resumed*
   start_epoch (exercised via the Trainer attribute flow, loader-free).
3. coco_eval — evaluateImg must be invariant to detection insertion order
   within an (image, category) bucket, and must not crash when a bucket
   holds more than maxDets[-1] detections.
4. EMA must carry batch_stats alongside params (reference ModelEMA
   averages every floating state-dict entry, BN stats included).
5. NMS fixpoint budget must be raisable for deep suppression chains.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# 1. every BN in the head updates its stats in train mode


def test_head_all_bns_train():
    from eop_tpu.models.head import YOLOXHead

    head = YOLOXHead(num_classes=3, width=0.125, in_channels=(32, 64, 128))
    rng = np.random.RandomState(0)
    xin = [
        jnp.asarray(rng.rand(2, s, s, c).astype(np.float32))
        for s, c in [(16, 32), (8, 64), (4, 128)]
    ]
    variables = head.init(jax.random.PRNGKey(0), xin, False)
    _, mut = head.apply(variables, xin, True, mutable=["batch_stats"])

    moved, frozen = [], []
    flat_new = jax.tree_util.tree_flatten_with_path(mut["batch_stats"])[0]
    flat_old = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(
            variables["batch_stats"]
        )[0]
    }
    for path, new in flat_new:
        key = jax.tree_util.keystr(path)
        if "mean" not in key:
            continue
        (moved if not np.allclose(np.asarray(new), flat_old[key])
         else frozen).append(key)
    assert moved, "no BN stats updated at all"
    # the round-1 bug: reg_conv_{k}_1 ran in eval mode during training
    assert not frozen, f"BN stats frozen in train mode: {frozen}"
    assert any("reg_conv_0_1" in k for k in moved)


# ---------------------------------------------------------------------------
# 2. resume restores start_epoch before no_aug / loader construction


def test_trainer_resume_orders_no_aug(tmp_path, monkeypatch):
    from eop_tpu.exp import Exp
    from eop_tpu.train.checkpoint import save_checkpoint
    from eop_tpu.train.trainer import Trainer

    exp = Exp()
    exp.max_epoch = 20
    exp.no_aug_epochs = 15
    exp.output_dir = str(tmp_path)
    exp.exp_name = "resume_order"
    exp.data_dir = None
    exp.input_size = (64, 64)

    # checkpoint landing inside the no-aug tail: epoch 10 >= 20 - 15
    ckpt_dir = tmp_path / "ck"
    save_checkpoint({"dummy": np.zeros(1, np.float32)}, False,
                    str(ckpt_dir), "latest",
                    metadata={"start_epoch": 10})

    class Args:
        batch_size = 2
        resume = True
        ckpt = str(ckpt_dir / "latest_ckpt")
        start_epoch = None
        experiment_name = "resume_order"

    captured = {}

    def fake_loader(batch_size, is_distributed, no_aug,
                    cache_img=False, rank=0, world_size=1):
        captured["no_aug"] = no_aug
        raise StopIteration("stop after loader construction")

    monkeypatch.setattr(exp, "get_data_loader", fake_loader)
    trainer = Trainer(exp, Args())
    with pytest.raises(StopIteration):
        trainer.before_train()
    assert trainer.start_epoch == 10
    assert captured["no_aug"] is True, (
        "resuming into the no-aug tail must build the loader mosaic-closed"
    )


# ---------------------------------------------------------------------------
# 3. COCOeval detection-order invariance + >maxDets bucket


def _gt_one_image(n_gts):
    from eop_tpu.data.coco_api import COCO

    rng = np.random.RandomState(7)
    anns = []
    for i in range(n_gts):
        x, y = rng.randint(0, 500, 2)
        w, h = rng.randint(20, 120, 2)
        anns.append({"id": i + 1, "image_id": 1, "category_id": 1,
                     "bbox": [int(x), int(y), int(w), int(h)],
                     "area": int(w * h), "iscrowd": 0})
    gt = COCO()
    gt.dataset = {
        "images": [{"id": 1, "width": 640, "height": 640,
                    "file_name": "1.jpg"}],
        "annotations": anns,
        "categories": [{"id": 1, "name": "c"}],
    }
    gt.createIndex()
    return gt


def _run_eval(gt, dets):
    from eop_tpu.eval.coco_eval import COCOeval

    dt = gt.loadRes([dict(d) for d in dets])
    e = COCOeval(gt, dt, "bbox")
    e.evaluate()
    e.accumulate()
    e.summarize()
    return e.stats


def test_cocoeval_detection_order_invariance():
    gt = _gt_one_image(8)
    rng = np.random.RandomState(3)
    dets = []
    for ann in gt.dataset["annotations"]:
        x, y, w, h = ann["bbox"]
        # jittered boxes with distinct scores -> nontrivial matching
        dets.append({"image_id": 1, "category_id": 1,
                     "bbox": [x + rng.randint(-8, 8), y + rng.randint(-8, 8),
                              w, h],
                     "score": float(rng.rand())})
    for _ in range(6):  # some FPs
        dets.append({"image_id": 1, "category_id": 1,
                     "bbox": [int(rng.randint(0, 500)),
                              int(rng.randint(0, 500)), 30, 30],
                     "score": float(rng.rand())})

    sorted_stats = _run_eval(
        gt, sorted(dets, key=lambda d: -d["score"])
    )
    shuffled = list(dets)
    rng.shuffle(shuffled)
    shuffled_stats = _run_eval(gt, shuffled)
    np.testing.assert_allclose(shuffled_stats, sorted_stats, atol=1e-12)


def test_cocoeval_bucket_larger_than_maxdets():
    """>maxDets[-1] detections in one bucket must not index OOB."""
    gt = _gt_one_image(3)
    rng = np.random.RandomState(5)
    dets = [
        {"image_id": 1, "category_id": 1,
         "bbox": [int(rng.randint(0, 500)), int(rng.randint(0, 500)),
                  25, 25],
         "score": float(rng.rand())}
        for _ in range(120)  # maxDets[-1] is 100
    ]
    stats = _run_eval(gt, dets)
    assert np.isfinite(stats[:2]).all()


# ---------------------------------------------------------------------------
# 4. EMA carries batch_stats


def test_ema_batch_stats_in_state_and_updated():
    from eop_tpu.losses import Loss24PConfig
    from eop_tpu.models import YOLOX
    from eop_tpu.train import build_sgd, create_train_state
    from eop_tpu.train.steps import make_train_step_24p

    model = YOLOX(depth=0.33, width=0.125, num_classes=3, reg_dim=26)
    tx = build_sgd(0.01, momentum=0.9, weight_decay=5e-4, nesterov=True)
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), sample,
        use_ema=True, with_dwa=True,
    )
    assert state.ema_batch_stats is not None

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    labels = np.zeros((2, 50, 51), np.float32)
    ang = np.arange(24) * 15.0 * np.pi / 180.0
    labels[:, 0, 0] = 1
    labels[:, 0, 1:3] = 32.0
    labels[:, 0, 3::2] = 32.0 + 8.0 * np.cos(ang)
    labels[:, 0, 4::2] = 32.0 + 8.0 * np.sin(ang)
    labels = jnp.asarray(labels)

    step = jax.jit(make_train_step_24p(
        model, tx, Loss24PConfig(num_classes=3), ema_decay=0.9998
    ))
    new_state, _ = step(state, images, labels, jax.random.PRNGKey(1))

    init_leaves = jax.tree_util.tree_leaves(state.ema_batch_stats)
    new_leaves = jax.tree_util.tree_leaves(new_state.ema_batch_stats)
    live_leaves = jax.tree_util.tree_leaves(new_state.batch_stats)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(init_leaves, new_leaves)
    ), "ema_batch_stats never updated"
    # ramped decay at step 1 is ~5e-4 -> EMA tracks the live stats closely
    # but not exactly (it blends in the init copy)
    assert all(np.isfinite(np.asarray(x)).all() for x in new_leaves)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(new_leaves, live_leaves)
    ), "ema_batch_stats must lag the live stats"


# ---------------------------------------------------------------------------
# 5. deep suppression chains with a raised fixpoint budget


def _greedy_nms_py(boxes, scores, thr):
    order = np.argsort(-scores, kind="mergesort")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a + b - inter) > thr and scores[j] < scores[i]:
                suppressed[j] = True
    return sorted(keep)


def test_nms_deep_chain_exact_with_full_budget():
    """A 64-deep suppression chain: box i overlaps only box i+1 above the
    threshold, so greedy keeps the even indices. The default budget is a
    perf compromise; fixpoint_iters=k must be greedy-exact."""
    from eop_tpu.ops.nms import nms

    n = 64
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        boxes[i] = [i * 4.0, 0.0, i * 4.0 + 10.0, 10.0]
    scores = np.linspace(0.9, 0.1, n).astype(np.float32)  # descending
    thr = 0.4  # IoU(i, i+1) = 6/14 = .43 ; IoU(i, i+2) = 2/18 = .11

    keep, order = nms(jnp.asarray(boxes), jnp.asarray(scores), thr,
                      fixpoint_iters=n)
    kept = sorted(np.asarray(order)[np.asarray(keep)].tolist())
    assert kept == _greedy_nms_py(boxes, scores, thr)
    assert kept == list(range(0, n, 2))
