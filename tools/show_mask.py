#!/usr/bin/env python3
"""Debug tool: render per-class mask contours for one COCO image.

Parity target: `/root/reference/yolox_24p/datasets/show_mask.py:19-202` —
a manual sanity check of segmentation masks before 24p label generation.

    python tools/show_mask.py --json <instances.json> --images <dir> \
        --image-id 42 --out /tmp/mask_vis.png
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import cv2

    from eop_tpu.data.coco_api import COCO
    from eop_tpu.utils.visualize import _COLORS

    parser = argparse.ArgumentParser("eop_tpu show_mask")
    parser.add_argument("--json", required=True)
    parser.add_argument("--images", required=True)
    parser.add_argument("--image-id", type=int, default=None,
                        help="defaults to the first image in the json")
    parser.add_argument("--out", default="mask_vis.png")
    args = parser.parse_args()

    coco = COCO(args.json)
    img_id = args.image_id or sorted(coco.imgs.keys())[0]
    info = coco.loadImgs(img_id)[0]
    path = os.path.join(args.images, info["file_name"])
    image = cv2.imread(path)
    assert image is not None, path

    anns = coco.loadAnns(coco.getAnnIds(imgIds=img_id))
    for ann in anns:
        mask = coco.annToMask(ann)
        contours, _ = cv2.findContours(
            mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
        )
        color = (
            _COLORS[ann["category_id"] % len(_COLORS)] * 255
        ).astype(np.uint8).tolist()
        cv2.drawContours(image, contours, -1, color, 2)
        x, y, w, h = (int(v) for v in ann["bbox"])
        cv2.putText(image, str(ann["category_id"]), (x, max(y - 3, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    cv2.imwrite(args.out, image)
    print(f"{len(anns)} masks -> {args.out}")


if __name__ == "__main__":
    main()
