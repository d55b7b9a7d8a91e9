#!/bin/bash
# 4-backbone comparative drive (VERDICT r4 item 1b): train
# PAFPN+{darknet,vgg,resnet,densenet} at depth/width 1.0 on the synthetic
# set, sequentially (single TPU chip, single-core host).
set -u
DATA=${DATA:-/tmp/fisheye_coco}
OUT=${OUT:-/tmp/eop_bbstudy}
EPOCHS=${EPOCHS:-80}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
for bt in darknet vgg resnet densenet; do
  echo "=== training $bt ($(date)) ==="
  timeout 3600 python tools/train.py -n yolox-l -expn "yolox_l_$bt" -b 8 \
    --data-dir "$DATA" \
    num_classes 3 input_size "(256,256)" test_size "(256,256)" \
    max_epoch "$EPOCHS" no_aug_epochs 10 eval_interval 20 warmup_epochs 2 \
    multiscale_range 2 data_num_workers 2 test_conf 0.05 \
    compute_dtype bfloat16 ckpt_interval 10 output_dir "$OUT" backbone_type "$bt" \
    > "$OUT/train_$bt.out" 2>&1
  echo "=== $bt done rc=$? ($(date)) ==="
done
echo ALL_DONE
