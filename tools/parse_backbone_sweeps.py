#!/usr/bin/env python3
"""Summarize the 4-backbone comparative study: per-backbone per-sweep AP
plus the stride-32 GT-region activation trend, from the
`drive_backbone_sweeps.sh` logs.

Usage: python tools/parse_backbone_sweeps.py [/tmp/eop_bbstudy]
Prints a markdown table ready for BASELINE.md.
"""

from __future__ import annotations

import os
import re
import sys


def parse_log(path):
    text = open(path).read()
    # sweep sections: ****...<name>**** then AP lines
    sweeps = {}
    for m in re.finditer(r"\*{24}(\S+?)\*{24}", text):
        name = m.group(1)
        seg = text[m.end():m.end() + 4000]
        ap_50_95 = re.search(
            r"IoU=0\.50:0\.95 \| area=   all \| maxDets=100 \] = "
            r"(-?\d+\.\d+)", seg)
        ap_50 = re.search(
            r"IoU=0\.50      \| area=   all \| maxDets=100 \] = "
            r"(-?\d+\.\d+)", seg)
        if ap_50 and ap_50_95:
            sweeps[name] = (float(ap_50.group(1)),
                            float(ap_50_95.group(1)))
    # final stride-32 activation table: last "Feature Map Size" grid
    # (20x20 at frame 640, 8x8 at 256); rows: | name | 5 offset values |
    act = {}
    idx = max(text.rfind("Feature Map Size: 20x20"),
              text.rfind("Feature Map Size: 8x8"))
    if idx >= 0:
        seg = text[idx:]
        for row in re.finditer(
                r"\|\s+(None|theta_\d+)\s+\|([^\n]+)\|", seg):
            vals = [float(v) for v in row.group(2).replace("|", " ").split()
                    if v != "nan"]
            if vals:
                act[row.group(1)] = sum(vals) / len(vals)
    return sweeps, act


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/eop_bbstudy"
    backbones = ["darknet", "vgg", "resnet", "densenet"]
    data = {}
    for bt in backbones:
        p = os.path.join(out, f"sweep_{bt}.out")
        if os.path.exists(p):
            data[bt] = parse_log(p)
    if not data:
        print("no sweep logs found")
        return

    names = ["none"] + [f"theta_{t}" for t in range(30, 95, 5)]
    print("| sweep | " + " | ".join(
        f"{bt} AP50 / AP50:95" for bt in data) + " |")
    print("|---|" + "---|" * len(data))
    for name in names:
        cells = []
        for bt in data:
            v = data[bt][0].get(name)
            cells.append(f"{v[0]:.3f} / {v[1]:.3f}" if v else "-")
        print(f"| {name} | " + " | ".join(cells) + " |")

    print("\nstride-32 mean GT-region activation (avg over offsets):\n")
    print("| sweep | " + " | ".join(data) + " |")
    print("|---|" + "---|" * len(data))
    for name in ["None"] + [f"theta_{t}" for t in range(30, 95, 5)]:
        cells = [f"{data[bt][1].get(name, float('nan')):.4f}"
                 for bt in data]
        print(f"| {name} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
