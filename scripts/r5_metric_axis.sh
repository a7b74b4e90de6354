#!/bin/bash
# Metric-axis trained demos: every committed demo so far is mse-trained and
# L2-attacked.  The reference's metric axes are (a) the trained model
# flavour `-metric ms-ssim` with the msim lambda table
# (/root/reference/train.py:255-258) and lpips training
# (/root/reference/train.py:47,92-94), and (b) the attack-loss metric
# `-att_metric msim` (/root/reference/attack_rd.py:379-392).  This script
# lands trained-weight evidence for both axes on the hyper anchor.
#
# Usage: bash scripts/r5_metric_axis.sh [WAIT_PID]
set -u
cd /root/repo
mkdir -p logs ckpts/demo

if [ $# -ge 1 ]; then
  echo "waiting for pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

PY="python -m imagecompression_adversarial_tpu.cli"

echo "### [1/8] train hyper q4 ms-ssim (2000 steps, synthetic)  $(date)"
timeout 9000 $PY.train -m hyper -q 4 -metric ms-ssim -max_steps 2000 \
  2>&1 | tee logs/r5_train_msssim.log | tail -4

echo "### [2/8] export ms-ssim demo ckpt  $(date)"
timeout 1800 python scripts/export_ckpt.py ckpts/anchor/hyper-16.64-ms-ssim \
  -m hyper -q 4 -o ckpts/demo/hyper-q4-msssim-synthetic.msgpack 2>&1 | tail -2

echo "### [3/8] attack msim-trained model (L2 attack loss, 1001 steps)  $(date)"
timeout 9000 $PY.attack_rd -m hyper -q 4 -metric ms-ssim \
  -ckpt ckpts/demo/hyper-q4-msssim-synthetic.msgpack \
  -steps 1001 -s '/tmp/kodak24/kodim0[12].png' 2>&1 \
  | tee logs/r5_attack_msssim_l2.log | tail -3

echo "### [4/8] attack msim-trained model (ms-ssim attack loss)  $(date)"
timeout 9000 $PY.attack_rd -m hyper -q 4 -metric ms-ssim \
  -ckpt ckpts/demo/hyper-q4-msssim-synthetic.msgpack \
  -att_metric ms-ssim -steps 1001 -s '/tmp/kodak24/kodim0[12].png' 2>&1 \
  | tee logs/r5_attack_msssim_msim.log | tail -3

echo "### [5/8] attack mse-trained model with ms-ssim attack loss  $(date)"
timeout 9000 $PY.attack_rd -m hyper -q 4 -metric mse \
  -ckpt ckpts/demo/hyper-q4-mse-synthetic.msgpack \
  -att_metric ms-ssim -steps 1001 -s '/tmp/kodak24/kodim0[12].png' 2>&1 \
  | tee logs/r5_attack_mse_msim.log | tail -3

echo "### [6/8] train hyper q1 lpips (2000 steps, synthetic)  $(date)"
timeout 9000 $PY.train -m hyper -q 1 -metric lpips -max_steps 2000 \
  2>&1 | tee logs/r5_train_lpips.log | tail -4

echo "### [7/8] export lpips demo ckpt  $(date)"
timeout 1800 python scripts/export_ckpt.py ckpts/anchor/hyper-2.4-lpips \
  -m hyper -q 1 -o ckpts/demo/hyper-q1-lpips-synthetic.msgpack 2>&1 | tail -2

echo "### [8/8] attack lpips-trained model (1001 steps)  $(date)"
timeout 9000 $PY.attack_rd -m hyper -q 1 -metric lpips \
  -ckpt ckpts/demo/hyper-q1-lpips-synthetic.msgpack \
  -steps 1001 -s '/tmp/kodak24/kodim0[12].png' 2>&1 \
  | tee logs/r5_attack_lpips.log | tail -3

echo "metric-axis demos done at $(date)"
