#!/usr/bin/env python3
"""Generate 24-point labels from COCO instance masks by ray casting.

Parity target: `/root/reference/yolox_24p/datasets/2+24_labels_create.py`
CLI-ified (the reference hardcodes its paths).

    python tools/labels_create_24p.py \
        --json /data/COCO/annotations/instances_train2017.json \
        --images /data/COCO/train2017 --out ./COCO_24p_label --mode Cord
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser("eop_tpu 24p label generator")
    parser.add_argument("--json", required=True,
                        help="COCO instances json with segmentation")
    parser.add_argument("--images", required=True, help="images directory")
    parser.add_argument("--out", default="./COCO_24p_label")
    parser.add_argument("--mode", choices=["Cord", "Radius"],
                        default="Cord")
    parser.add_argument("--area-low", type=float, default=0.5)
    parser.add_argument("--area-high", type=float, default=1.5)
    args = parser.parse_args()

    from eop_tpu.data.labels24p import Polygon24

    gen = Polygon24(args.json, args.images, args.out, mode=args.mode)
    gen.process(area_t_low=args.area_low, area_t_high=args.area_high,
                progress=True)
    gen.save()
    print(f"labels written to {args.out}")


if __name__ == "__main__":
    main()
