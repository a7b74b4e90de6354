#!/bin/bash
# Kodak-24 corpus rows for the three newly-trained anchor families
# (factorized / context / cheng2020) — extends the RESULTS.md per-family
# 24-image AVG table to the full 10-family set.  These are one-shot
# (non-AR-decode) estimate paths, so the whole corpus runs in one process.
#
# Usage: bash scripts/r5_anchors_k24.sh [WAIT_PID]
set -u
cd /root/repo
mkdir -p logs

if [ $# -ge 1 ]; then
  echo "waiting for pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

PY="python -m imagecompression_adversarial_tpu.cli"

for m in factorized context cheng2020; do
  ck=ckpts/demo/${m}-q4-mse-synthetic.msgpack
  if [ ! -f "$ck" ]; then
    echo "### SKIP $m: $ck missing (anchors leg failed?)"
    continue
  fi
  echo "### $m q4 Kodak-24 (1001 steps)  $(date)"
  timeout 14400 $PY.attack_rd -m $m -q 4 -metric mse -ckpt $ck \
    -steps 1001 -s '/tmp/kodak24/kodim*.png' 2>&1 \
    | tee logs/r5_k24_${m}.log | tail -2
done

echo "anchors-k24 leg done at $(date)"
