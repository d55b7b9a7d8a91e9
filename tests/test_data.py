"""Data pipeline tests: COCO API, datasets, mosaic, loader, 24p labels."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from eop_tpu.data.augment import TrainTransform, ValTransform, preproc
from eop_tpu.data.coco_api import (
    COCO,
    mask_to_rle,
    polygons_to_mask,
    rle_to_mask,
)
from eop_tpu.data.coco_dataset import COCODataset
from eop_tpu.data.coco24p import COCO24PDataset, TrainTransform24P
from eop_tpu.data.dataloading import DataLoader, worker_init_reset_seed
from eop_tpu.data.labels24p import Polygon24, ray_cast_24
from eop_tpu.data.mosaic import MosaicDetection
from eop_tpu.data.samplers import InfiniteSampler, YoloBatchSampler


# ---------------------------------------------------------------------------
# fixtures: synthetic COCO dataset on disk
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    (root / "annotations").mkdir()
    (root / "train2017").mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, 5):
        h, w = int(rng.randint(80, 160)), int(rng.randint(80, 160))
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        name = f"{img_id:012}.jpg"
        cv2.imwrite(str(root / "train2017" / name), img)
        images.append(
            {"id": img_id, "width": w, "height": h, "file_name": name}
        )
        for _ in range(rng.randint(1, 4)):
            bw, bh = rng.randint(10, 40, 2)
            x = rng.randint(0, max(w - bw, 1))
            y = rng.randint(0, max(h - bh, 1))
            # square polygon segmentation matching the box
            seg = [
                [float(x), float(y), float(x + bw), float(y),
                 float(x + bw), float(y + bh), float(x), float(y + bh)]
            ]
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": int(rng.choice([1, 2, 3])),
                    "bbox": [float(x), float(y), float(bw), float(bh)],
                    "area": float(bw * bh),
                    "iscrowd": 0,
                    "segmentation": seg,
                }
            )
            ann_id += 1
    categories = [
        {"id": 1, "name": "a"}, {"id": 2, "name": "b"},
        {"id": 3, "name": "c"},
    ]
    with open(root / "annotations" / "instances_train2017.json", "w") as f:
        json.dump(
            {"images": images, "annotations": annotations,
             "categories": categories},
            f,
        )
    return str(root)


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = (rng.rand(37, 53) > 0.7).astype(np.uint8)
    rle = mask_to_rle(mask)
    np.testing.assert_array_equal(rle_to_mask(rle), mask)


def test_polygon_mask():
    mask = polygons_to_mask([[10, 10, 30, 10, 30, 20, 10, 20]], 40, 50)
    assert mask[15, 20] == 1
    assert mask[5, 5] == 0
    assert mask.sum() > 150  # ~ 20x10 rectangle


def test_coco_dataset(coco_dir):
    ds = COCODataset(
        data_dir=coco_dir, json_file="instances_train2017.json",
        name="train2017", img_size=(128, 128),
        preproc=TrainTransform(max_labels=50, flip_prob=0.5, hsv_prob=1.0),
    )
    assert len(ds) == 4
    img, labels, info, img_id = ds[0]
    assert img.shape == (128, 128, 3) and img.dtype == np.float32
    assert labels.shape == (50, 5)
    assert (labels[:, 3:5] >= 0).all()


def test_mosaic_loader(coco_dir):
    base = COCODataset(
        data_dir=coco_dir, json_file="instances_train2017.json",
        name="train2017", img_size=(96, 96),
    )
    ds = MosaicDetection(
        base, img_size=(96, 96), mosaic=True,
        preproc=TrainTransform(max_labels=30),
        degrees=10.0, translate=0.1, mosaic_scale=(0.5, 1.5),
        mixup_scale=(0.5, 1.5), shear=2.0, enable_mixup=True, seed=0,
    )
    sampler = InfiniteSampler(len(ds), seed=0)
    batch_sampler = YoloBatchSampler(sampler, 4, False)
    loader = DataLoader(
        ds, batch_sampler=batch_sampler, num_workers=2,
        worker_init_fn=worker_init_reset_seed,
    )
    it = iter(loader)
    for _ in range(3):
        imgs, labels, info, ids = next(it)
        assert imgs.shape == (4, 96, 96, 3)
        assert labels.shape == (4, 30, 5)
    loader.shutdown()

    # close_mosaic flips the flag for subsequent batches
    loader2 = DataLoader(ds, batch_sampler=batch_sampler, num_workers=0)
    loader2.close_mosaic()
    assert batch_sampler.mosaic is False


def test_infinite_sampler_rank_split():
    s0 = InfiniteSampler(10, seed=3, rank=0, world_size=2)
    s1 = InfiniteSampler(10, seed=3, rank=1, world_size=2)
    import itertools

    a = list(itertools.islice(iter(s0), 10))
    b = list(itertools.islice(iter(s1), 10))
    # the two ranks must never collide at any stream position
    assert all(x != y for x, y in zip(a, b)), (a, b)
    # together they cover the full permutation stream, epoch after epoch
    merged = [v for pair in zip(a, b) for v in pair]
    assert sorted(merged[:10]) == list(range(10))
    assert sorted(merged[10:20]) == list(range(10))


# ---------------------------------------------------------------------------
# 24p label generation: parity vs a direct transcription of the reference's
# template-based ray casting (2+24_labels_create.py:61-116)
# ---------------------------------------------------------------------------

def _ref_rotation_for_24p(center_x, center_y, mask):
    cord_results, radius_results = [], []
    img_h, img_w = mask.shape[0], mask.shape[1]
    max_line = int(np.sqrt(np.power(img_h, 2) + np.power(img_w, 2)))
    mask_pad = cv2.copyMakeBorder(
        mask.copy(), max_line, max_line, max_line, max_line,
        cv2.BORDER_CONSTANT, value=0,
    )
    mask_x, mask_y = np.where(mask_pad != 0)
    horizontal_cord_x = np.arange(0, max_line, 0.2)
    horizontal_cord_y = np.zeros_like(horizontal_cord_x)
    rot_line = np.array([horizontal_cord_x, horizontal_cord_y])
    for rot_time in range(24):
        template = cv2.copyMakeBorder(
            np.zeros_like(mask), max_line, max_line, max_line, max_line,
            cv2.BORDER_CONSTANT, value=0,
        )
        theta_rad = rot_time * 15 * np.pi / 180
        m_rot = np.array(
            [[np.cos(theta_rad), -1 * np.sin(theta_rad)],
             [np.sin(theta_rad), np.cos(theta_rad)]]
        )
        rot_end = np.matmul(m_rot, rot_line).astype(np.int16)
        rot_end_uniq = rot_end[0, :] + rot_end[1, :] * 1j
        _, idx = np.unique(rot_end_uniq, return_index=True)
        rot_end = rot_end[:, idx]
        rot_end[0, :] = rot_end[0, :] + center_x + max_line
        rot_end[1, :] = rot_end[1, :] + center_y + max_line
        template[rot_end[1, :], rot_end[0, :]] = 255
        template[mask_x, mask_y] = 0
        mask_cut = template[
            max_line - 1: max_line + img_h + 1,
            max_line - 1: max_line + img_w + 1,
        ]
        marker_y, marker_x = np.where(mask_cut == 255)
        dist_center = np.sqrt(
            np.power(marker_x - center_x, 2)
            + np.power(marker_y - center_y, 2)
        )
        final_idx = np.argmin(dist_center)
        x_final = np.clip(marker_x[final_idx], 0, img_w)
        y_final = np.clip(marker_y[final_idx], 0, img_h)
        cord_results.append(np.array([x_final, y_final]))
        radius_results.append(dist_center[final_idx])
    return np.array(cord_results), np.array(radius_results)


def test_ray_cast_parity():
    rng = np.random.RandomState(0)
    for trial in range(3):
        h, w = 60, 80
        mask = np.zeros((h, w), np.uint8)
        cx, cy = rng.uniform(25, 55), rng.uniform(20, 40)
        axes = (int(rng.randint(10, 22)), int(rng.randint(8, 18)))
        cv2.ellipse(
            mask, (int(cx), int(cy)), axes,
            int(rng.randint(0, 180)), 0, 360, 1, -1,
        )
        ref_c, ref_r = _ref_rotation_for_24p(cx, cy, mask)
        our_c, our_r = ray_cast_24(cx, cy, mask)
        # ties in "nearest surviving pixel" can pick a different equal-dist
        # pixel; radii must match to float tolerance, cords within 1 px
        np.testing.assert_allclose(our_r, ref_r, atol=1e-6, err_msg=str(trial))
        assert np.abs(our_c - ref_c).max() <= 1, trial


def test_label_generator_end_to_end(coco_dir, tmp_path):
    out = tmp_path / "labels"
    gen = Polygon24(
        os.path.join(coco_dir, "annotations", "instances_train2017.json"),
        os.path.join(coco_dir, "train2017"),
        str(out),
    )
    # synthetic categories 1..3 are valid COCO ids
    cords, radii = gen.process()
    gen.save()
    txts = list(out.glob("*.txt"))
    assert txts, "no label files written"
    rows = np.loadtxt(str(txts[0]))
    rows = rows.reshape(-1, 51)
    assert rows.shape[1] == 51
    assert (rows[:, 1:] >= 0).all() and (rows[:, 1:] <= 1.5).all()

    # 24p dataset + transform consume the generated labels
    ds = COCO24PDataset(
        data_dir=os.path.join(coco_dir, "train2017"),
        label_dir=str(out),
        img_size=(128, 128),
        preproc=TrainTransform24P(max_labels=50),
    )
    img, target, info, img_id = ds[0]
    assert img.shape == (128, 128, 3)
    assert target.shape == (50, 51)


def test_concat_datasets():
    from eop_tpu.data.datasets_wrapper import (
        ConcatDataset,
        Dataset,
        MixConcatDataset,
    )

    class Toy(Dataset):
        def __init__(self, base):
            super().__init__((32, 32))
            self.base = base

        def __len__(self):
            return 3

        @Dataset.mosaic_getitem
        def __getitem__(self, i):
            return self.base + i

        def pull_item(self, i):
            return ("pull", self.base + i)

    c = ConcatDataset([Toy(0), Toy(100)])
    assert len(c) == 6
    assert c[4] == 101
    assert c.pull_item(1) == ("pull", 1)
    assert c.pull_item(-1) == ("pull", 102)

    m = MixConcatDataset([Toy(0), Toy(100)])
    assert m[(True, 4, 0)] == 101   # tuple-index protocol routes through
    assert m[2] == 2


def test_exp_repr_and_merge():
    from eop_tpu.exp import Exp

    exp = Exp()
    exp.merge(["max_epoch", "5", "mosaic_scale", "(0.2, 1.0)",
               "enable_mixup", "False", "act", "relu"])
    assert exp.max_epoch == 5
    assert exp.mosaic_scale == (0.2, 1.0)
    assert exp.enable_mixup is False
    assert exp.act == "relu"
    table = repr(exp)
    assert "max_epoch" in table and "5" in table


def test_merge_none_default_coercion():
    from eop_tpu.exp import Exp

    exp = Exp()
    exp.merge(["seed", "3", "data_dir", "/some/path",
               "random_size", "(10, 20)"])
    assert exp.seed == 3                 # literal int, not "3"
    assert exp.data_dir == "/some/path"  # plain string preserved
    assert exp.random_size == (10, 20)


def test_fast_path_byte_exactness():
    """The host-pipeline fast paths produce the same bytes as the naive
    formulations they replaced (mixup uint16 blend, 3-channel HSV LUT,
    identity letterbox resize)."""
    import cv2

    rng = np.random.default_rng(0)
    for _ in range(3):
        a = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        b = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        naive = (0.5 * a.astype(np.float32)
                 + 0.5 * b.astype(np.float32)).astype(np.uint8)
        fast = ((a.astype(np.uint16) + b) >> 1).astype(np.uint8)
        assert (naive == fast).all()

        img = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
        ramp = np.arange(256, dtype=np.int16)
        tables = (((ramp + 3) % 180).astype(np.uint8),
                  np.clip(ramp - 17, 0, 255).astype(np.uint8),
                  np.clip(ramp + 11, 0, 255).astype(np.uint8))
        h, s, v = cv2.split(hsv)
        naive = cv2.merge((cv2.LUT(h, tables[0]), cv2.LUT(s, tables[1]),
                           cv2.LUT(v, tables[2])))
        fast = cv2.LUT(hsv, np.stack(tables, -1).reshape(1, 256, 3))
        assert (naive == fast).all()

        assert (cv2.resize(img, (48, 48),
                           interpolation=cv2.INTER_LINEAR) == img).all()

    # preproc identity fast path: same output as a forced resize+paste
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    out, r = preproc(img, (64, 64))
    assert r == 1.0
    np.testing.assert_array_equal(out, img.astype(np.float32))


def test_all_workers_sigkilled_raises_not_hangs():
    """Round-5 chaos-drive find: SIGKILLing every worker mid-stream must
    raise the loader's worker-death RuntimeError, never hang.  A worker
    killed midway through writing a multi-MB batch leaves a PARTIAL
    message in the mp.Queue pipe: poll() reports readable, recv_bytes()
    blocks past the get() timeout (the parent's own write end keeps the
    pipe from EOF).  The loader now drains the mp.Queue on a sacrificial
    daemon thread and runs its liveness logic against an in-process
    queue, so the consumer always gets the clean error."""
    import os
    import signal
    import threading
    import time

    from _worker_death_ds import BigDS

    loader = DataLoader(BigDS(), batch_size=2, num_workers=2,
                        shuffle=False, prefetch_batches=2)
    outcome = {}

    def consume():
        try:
            for k, _ in enumerate(iter(loader)):
                if k == 0:
                    outcome["first"] = time.time()
                time.sleep(0.05)  # let the workers stream ahead
            outcome["result"] = "exhausted"
        except RuntimeError as e:
            outcome["result"] = f"raised: {e}"

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    deadline = time.time() + 60
    while "first" not in outcome and time.time() < deadline:
        time.sleep(0.01)
    assert "first" in outcome, "loader never produced a batch"
    time.sleep(0.12)
    for p in loader._workers:
        os.kill(p.pid, signal.SIGKILL)
    t.join(timeout=40)
    assert not t.is_alive(), (
        "HANG: consumer still blocked 40s after all workers died"
    )
    assert outcome["result"].startswith("raised"), outcome["result"]
    assert "died" in outcome["result"]
