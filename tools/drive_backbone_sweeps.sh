#!/bin/bash
# Phase 2 of the 4-backbone comparative study (VERDICT r4 item 1b): run the
# full offset + sector-distortion sweep with per-FPN activation tables on
# each trained backbone variant, sequentially (single chip).
set -u
OUT=${OUT:-/tmp/eop_bbstudy}
FIXTURE=${FIXTURE:-/tmp/fixture_single.json}
IMDIR=${IMDIR:-/tmp/fisheye_coco/val2017}
cd "$(dirname "$0")/.."
for bt in darknet vgg resnet densenet; do
  ck="$OUT/yolox_l_$bt/best_ckpt"
  [ -d "$ck" ] || ck="$OUT/yolox_l_$bt/latest_ckpt"
  echo "=== sweep $bt ($(date)) ckpt=$ck ==="
  # test_size stays 640: the harness's feature-map GT mapping and the
  # 80/40/20 activation tables are stride-anchored to 640 (ref parity)
  timeout 3600 python tools/demo_featuremap.py -n yolox-l -c "$ck" \
    --backbone "$bt" --json "$FIXTURE" --image-dir "$IMDIR" \
    --conf 0.05 \
    num_classes 3 output_dir "$OUT/fm" \
    > "$OUT/sweep_$bt.out" 2>&1
  echo "=== $bt sweep done rc=$? ($(date)) ==="
done
echo SWEEPS_DONE
