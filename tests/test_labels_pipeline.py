"""The fisheye data-entry pipeline: synthetic COCO (with polygon
segmentations, round 4) -> `tools/labels_create_24p.py` ray-casting ->
trainable 24p label files.

This is the front half of the reference's research loop
(`yolox_24p/datasets/2+24_labels_create.py` -> `train_24p.py`), driven
end-to-end on the chip this round (BASELINE.md "Fisheye story drive");
the test pins the CPU-side mechanics so the drive stays reproducible:
the generator's segmentations rasterize, the ray-caster accepts them
through its hull-area gate, and the emitted rows parse as the 51-column
normalized format `COCO24PDataset` trains on.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_synth_coco_to_24p_labels(tmp_path):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synth_datasets.py"),
         "coco", "--out", str(tmp_path), "--size", "128", "--n", "6",
         "--n-val", "2"],
        check=True, cwd=REPO,
    )
    ann_file = tmp_path / "annotations" / "instances_train2017.json"
    ann = json.loads(ann_file.read_text())
    # every annotation carries a usable polygon whose raster area matches
    # the declared area (the ray-caster's hull gate rejects 0.5x/1.5x
    # mismatches, `eop_tpu/data/labels24p.py`)
    assert ann["annotations"], "no annotations generated"
    from eop_tpu.data.coco_api import polygons_to_mask

    for a in ann["annotations"]:
        assert a["segmentation"], a["id"]
        m = polygons_to_mask(a["segmentation"], 128, 128)
        assert 0.6 * a["area"] <= m.sum() <= 1.4 * a["area"], (
            a["id"], a["area"], int(m.sum()))

    out = tmp_path / "labels24p"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "labels_create_24p.py"),
         "--json", str(ann_file), "--images", str(tmp_path / "train2017"),
         "--out", str(out)],
        check=True, cwd=REPO,
    )
    txts = sorted(out.glob("*.txt"))
    assert txts, "ray-caster emitted no label files"
    n_rows = 0
    for t in txts:
        rows = np.atleast_2d(np.loadtxt(t))
        if rows.size == 0:
            continue
        assert rows.shape[1] == 51, (t, rows.shape)
        n_rows += len(rows)
        # class ids valid, coordinates normalized
        assert set(rows[:, 0].astype(int)) <= {0, 1, 2}
        assert (rows[:, 1:] >= -0.01).all() and (rows[:, 1:] <= 1.01).all()
    # most annotations must survive the area gate (rect/ellipse polygons
    # are exactly their hulls, so near-total acceptance is expected)
    assert n_rows >= 0.8 * len(ann["annotations"]), (
        n_rows, len(ann["annotations"]))

    # and the rows feed the training dataset
    from eop_tpu.data.coco24p import COCO24PDataset, TrainTransform24P

    ds = COCO24PDataset(
        data_dir=str(tmp_path / "train2017"), label_dir=str(out),
        img_size=(128, 128), preproc=TrainTransform24P(max_labels=50),
    )
    img, label = ds[0][0], ds[0][1]
    assert img.shape[:2] == (128, 128)
    assert label.shape == (50, 51)
    assert label[:, 1:3].max() > 1.0  # pixel coords after the transform
