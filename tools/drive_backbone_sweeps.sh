#!/bin/bash
# Phase 2 of the 4-backbone comparative study (VERDICT r4 item 1b): run the
# full offset + sector-distortion sweep with per-FPN activation tables on
# each trained backbone variant, sequentially (single chip).
#
# The axon remote-compile service intermittently hangs a request forever
# (observed r5: all threads futex-parked on a response that never comes),
# so each sweep runs under a liveness watchdog: if the log stops growing
# for STALL_S seconds, kill and retry (up to 3 attempts).
set -u
OUT=${OUT:-/tmp/eop_bbstudy}
FIXTURE=${FIXTURE:-/tmp/fixture_single.json}
IMDIR=${IMDIR:-/tmp/fisheye_coco/val2017}
STALL_S=${STALL_S:-420}
cd "$(dirname "$0")/.."

run_with_watchdog() {  # $1=backbone $2=ckpt $3=log
  local bt=$1 ck=$2 log=$3
  for attempt in 1 2 3; do
    echo "=== sweep $bt attempt $attempt ($(date)) ckpt=$ck ===" | tee -a "$log"
    # tsize 256 = the models' training/eval scale (the harness's frame
    # constants follow exp.test_size since r5; reference hardcodes 640)
    timeout 3600 python tools/demo_featuremap.py -n yolox-l -c "$ck" \
      --backbone "$bt" --json "$FIXTURE" --image-dir "$IMDIR" \
      --conf 0.05 --tsize 256 \
      num_classes 3 output_dir "$OUT/fm" \
      >> "$log" 2>&1 &
    local pid=$!
    local last=0 now stalled=0
    while kill -0 $pid 2>/dev/null; do
      sleep 30
      now=$(stat -c %s "$log" 2>/dev/null || echo 0)
      if [ "$now" -eq "$last" ]; then
        stalled=$((stalled + 30))
        if [ $stalled -ge "$STALL_S" ]; then
          echo "=== $bt stalled ${STALL_S}s; killing for retry ===" | tee -a "$log"
          kill -9 $pid 2>/dev/null
          wait $pid 2>/dev/null
          sleep 10
          continue 2
        fi
      else
        stalled=0
        last=$now
      fi
    done
    wait $pid
    local rc=$?
    echo "=== $bt attempt $attempt done rc=$rc ($(date)) ==="
    [ $rc -eq 0 ] && return 0
  done
  return 1
}

for bt in darknet vgg resnet densenet; do
  ck="$OUT/yolox_l_$bt/best_ckpt"
  [ -d "$ck" ] || ck="$OUT/yolox_l_$bt/latest_ckpt"
  run_with_watchdog "$bt" "$ck" "$OUT/sweep_$bt.out"
done
echo SWEEPS_DONE
