"""Generate small synthetic datasets for end-to-end smoke training.

Two flavors, both learnable (class == color) so short CLI runs produce
meaningful AP curves (the image this framework is developed in has no
real COCO/VOC data):

* ``coco``: colored rectangles -> COCO json (train2017 + val2017), for
  `tools/train.py` / `tools/eval.py`.  Measured: yolox-s @256 px, b=8,
  80 epochs -> AP50 ~0.86.
* ``24p``: colored circles -> per-image txt labels in the 24-point format
  ``[cls, cx, cy, 24x(x, y)]`` (normalized), for `tools/train_24p.py`.
  Measured: d0.33/w0.25 @256 px, b=6, 200 epochs -> AP50 ~0.98.

Usage:
    python tools/make_synth_datasets.py coco --out /tmp/coco_synth
    python tools/make_synth_datasets.py 24p  --out /tmp/train24p_e2e
"""

from __future__ import annotations

import argparse
import json
import os

import cv2
import numpy as np

COLORS = {0: (220, 40, 40), 1: (40, 220, 40), 2: (40, 40, 220)}


def make_coco(root: str, size: int, n_train: int, n_val: int, seed: int):
    def split(name, n, s):
        rng = np.random.RandomState(s)
        os.makedirs(f"{root}/{name}", exist_ok=True)
        os.makedirs(f"{root}/annotations", exist_ok=True)
        images, annotations = [], []
        ann_id = 1
        for img_id in range(1, n + 1):
            img = rng.randint(0, 60, (size, size, 3)).astype(np.uint8)
            fname = f"{img_id:012}.jpg"
            for _ in range(rng.randint(1, 4)):
                bw, bh = rng.randint(30, int(size * 0.35), 2)
                x = rng.randint(0, size - bw)
                y = rng.randint(0, size - bh)
                cat = int(rng.choice([1, 2, 3]))
                # draw + segment as a polygon so downstream mask consumers
                # (tools/labels_create_24p.py ray-casting, the featuremap
                # harness's annToMask re-rendering) work on this set too;
                # rectangles for cat 1/3, an ellipse for cat 2 so the 24p
                # radii aren't all box-shaped
                if cat == 2:
                    cx, cy = x + bw / 2.0, y + bh / 2.0
                    ang = np.linspace(0, 2 * np.pi, 20, endpoint=False)
                    px = cx + (bw / 2.0) * np.cos(ang)
                    py = cy + (bh / 2.0) * np.sin(ang)
                    pts = np.stack([px, py], 1)
                    cv2.fillPoly(img, [pts.astype(np.int32)],
                                 COLORS[cat - 1])
                    seg = [float(v) for v in pts.reshape(-1)]
                    area = float(np.pi * (bw / 2.0) * (bh / 2.0))
                else:
                    cv2.rectangle(
                        img, (x, y), (x + bw, y + bh), COLORS[cat - 1], -1
                    )
                    seg = [float(x), float(y), float(x + bw), float(y),
                           float(x + bw), float(y + bh),
                           float(x), float(y + bh)]
                    area = float(bw * bh)
                annotations.append({
                    "id": ann_id, "image_id": img_id, "category_id": cat,
                    "bbox": [float(x), float(y), float(bw), float(bh)],
                    "area": area, "iscrowd": 0,
                    "segmentation": [seg],
                })
                ann_id += 1
            cv2.imwrite(f"{root}/{name}/{fname}", img)
            images.append({"id": img_id, "width": size, "height": size,
                           "file_name": fname})
        cats = [{"id": i + 1, "name": n}
                for i, n in enumerate(("red", "green", "blue"))]
        with open(f"{root}/annotations/instances_{name}.json", "w") as f:
            json.dump({"images": images, "annotations": annotations,
                       "categories": cats}, f)

    split("train2017", n_train, seed)
    split("val2017", n_val, seed + 1)
    print(f"coco: {n_train} train + {n_val} val images under {root}")


def make_24p(root: str, size: int, n: int, seed: int):
    rng = np.random.RandomState(seed)
    img_dir, lab_dir = f"{root}/imgs", f"{root}/labels"
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)
    ang = np.arange(24) * 15.0 * np.pi / 180.0
    for i in range(n):
        img = rng.randint(0, 60, (size, size, 3)).astype(np.uint8)
        rows = []
        for _ in range(rng.randint(1, 4)):
            cls = rng.randint(0, 3)
            r = rng.uniform(size * 0.07, size * 0.18)
            cx = rng.uniform(r + 5, size - r - 5)
            cy = rng.uniform(r + 5, size - r - 5)
            cv2.circle(img, (int(cx), int(cy)), int(r), COLORS[cls], -1)
            px, py = cx + r * np.cos(ang), cy + r * np.sin(ang)
            rows.append(
                [cls, cx / size, cy / size]
                + [v for xy in zip(px / size, py / size) for v in xy]
            )
        cv2.imwrite(f"{img_dir}/{i:04d}.jpg", img)
        np.savetxt(f"{lab_dir}/{i:04d}.txt", np.asarray(rows, float),
                   fmt="%.6f")
    print(f"24p: {n} images under {img_dir} + labels under {lab_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("flavor", choices=["coco", "24p"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--n-val", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if args.flavor == "coco":
        make_coco(args.out, args.size, args.n, args.n_val, args.seed)
    else:
        make_24p(args.out, args.size, args.n, args.seed)


if __name__ == "__main__":
    main()
