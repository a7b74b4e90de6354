#!/bin/bash
# On-chip trained-weight demos for the analysis/visualization CLIs that so
# far only had unit-test evidence: blur/deblur (ref test_commands/deblur.sh,
# random_noise.py:50-66), I-FGSM/MI-FGSM (attack_ifgsm.py:441+),
# natural-adversarial search (search.py:187-201), recon/latent dumps
# (visual.py:56-101), latent-linearity probe (attack_linear.py:163-204),
# pairwise compare (utils/metrics_compare/compare.py), latent distributions
# (visual_distribution.py).
#
# Requires the hyper-q4 range profile written by r5_kodak24b.sh leg 3.
# Usage: bash scripts/r5_analysis_sweep.sh [WAIT_PID]
set -u
cd /root/repo
mkdir -p logs

if [ $# -ge 1 ]; then
  echo "waiting for pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

PY="python -m imagecompression_adversarial_tpu.cli"
CK="ckpts/demo/hyper-q4-mse-synthetic.msgpack"

echo "### [1/8] blurgen: calibrated blur corpus (mse budget 1e-3)  $(date)"
timeout 3600 $PY.random_noise -m hyper -q 4 -metric mse -ckpt $CK \
  -degrade blurgen -noise 1e-3 -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_blurgen.log | tail -3

echo "### [2/8] deblur eval over Kodak-24  $(date)"
timeout 7200 $PY.random_noise -m hyper -q 4 -metric mse -ckpt $CK \
  -degrade deblur -s './attack/blur/kodim*.png' -t '/tmp/kodak24/kodim*.png' \
  2>&1 | tee logs/r5_deblur.log | tail -3

echo "### [3/8] MI-FGSM attack (default momentum), 1001 steps  $(date)"
timeout 9000 $PY.attack_ifgsm -m hyper -q 4 -metric mse -ckpt $CK \
  -steps 1001 -s '/tmp/kodak24/kodim0[12].png' 2>&1 \
  | tee logs/r5_ifgsm.log | tail -3

echo "### [4/8] PGD multi-start (best of 3), 1001 steps  $(date)"
timeout 9000 $PY.attack_ifgsm -m hyper -q 4 -metric mse -ckpt $CK \
  -random 3 -steps 1001 -s '/tmp/kodak24/kodim0[12].png' 2>&1 \
  | tee logs/r5_pgd3.log | tail -3

echo "### [5/8] natural-adversarial search over Kodak-24  $(date)"
timeout 7200 $PY.search -m hyper -q 4 -metric mse -ckpt $CK \
  -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_search.log | tail -5

echo "### [6/8] visual dumps (recon + y_hat.npy, noise mode)  $(date)"
timeout 3600 $PY.visual -m hyper -q 4 -metric mse -ckpt $CK \
  -s /tmp/kodak24/kodim01.png -t /tmp/r5_visual_rec.png 2>&1 \
  | tee logs/r5_visual.log | tail -3
timeout 3600 $PY.visual_distribution -m hyper -q 4 -metric mse -ckpt $CK \
  -s /tmp/kodak24/kodim01.png 2>&1 \
  | tee logs/r5_visual_distribution.log | tail -3

echo "### [7/8] latent-linearity probe (attack_linear)  $(date)"
timeout 9000 $PY.attack_linear -m hyper -q 4 -metric mse -ckpt $CK \
  -steps 1001 -s /tmp/kodak24/kodim01.png 2>&1 \
  | tee logs/r5_attack_linear.log | tail -5

echo "### [8/8] pairwise compare: originals vs calibrated blur  $(date)"
timeout 3600 $PY.compare '/tmp/kodak24/kodim*.png' './attack/blur/kodim*.png' \
  -device cpu 2>&1 | tee logs/r5_compare.log | tail -3

echo "analysis sweep done at $(date)"
