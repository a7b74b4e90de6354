#!/bin/bash
# Fresh-process re-run of the nlaic Kodak-24 leg: the first attempt died to
# a TPU worker crash two images in (logs/r5_k24_nlaic.log, 10:39) — same
# transient worker-fault class as the round-5 fic leg, which succeeded on a
# fresh-process re-run.
set -u
cd /root/repo
mkdir -p logs
if [ $# -ge 1 ]; then
  echo "waiting for pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
timeout 10800 python -m imagecompression_adversarial_tpu.cli.attack_rd \
  -m nlaic -q 3 -metric mse -ckpt ckpts/demo/nlaic-q3-mse-synthetic.msgpack \
  -steps 1001 -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24_nlaic_rerun.log | tail -3
echo "nlaic rerun done at $(date)"
