#!/bin/bash
# Kodak-24 defense table on the AUGMENTED checkpoint.  The r5_kodak24b legs
# ran the geometric self-ensemble against the plain synthetic-trained
# checkpoint, which is orientation-sensitive (no dihedral augmentation), so
# the ensemble's rotated variants decode worse and the defense shows
# negative benefit — an honest but handicapped configuration.  The
# reference's defense is evaluated on augmentation-trained weights
# (/root/reference/self_ensemble.py:328-441 + the -augment training
# convention); ckpts/demo/hyper-q4-mse-augmented.msgpack is the matching
# anchor (trained with the dihedral augmentation in round 2).
#
# Usage: bash scripts/r5_defense_aug.sh [WAIT_PID]
set -u
cd /root/repo
mkdir -p logs

if [ $# -ge 1 ]; then
  echo "waiting for pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

PY="python -m imagecompression_adversarial_tpu.cli"
CK="ckpts/demo/hyper-q4-mse-augmented.msgpack"

echo "### [1/5] plain attack baseline (augmented ckpt), Kodak-24  $(date)"
timeout 10800 $PY.attack_rd -m hyper -q 4 -metric mse -ckpt $CK \
  -steps 1001 -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24aug_attack.log | tail -3

echo "### [2/5] range profile (augmented ckpt) — overwrites the q4 profile  $(date)"
timeout 7200 $PY.feature_range -m hyper -q 4 -metric mse -ckpt $CK \
  -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24aug_feature_range.log | tail -3

echo "### [3/5] self-ensemble defense (non-adaptive), Kodak-24  $(date)"
timeout 10800 $PY.self_ensemble -m hyper -q 4 -metric mse -ckpt $CK \
  --defend -steps 1001 -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24aug_defend.log | tail -3

echo "### [4/5] self-ensemble defense (ADAPTIVE attack), Kodak-24  $(date)"
timeout 14400 $PY.self_ensemble -m hyper -q 4 -metric mse -ckpt $CK \
  --defend --adv -steps 1001 -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24aug_defend_adv.log | tail -3

echo "### [5/5] adaptive latent-clip defense, Kodak-24  $(date)"
timeout 14400 $PY.self_ensemble -m hyper -q 4 -metric mse -ckpt $CK \
  --defend --defend_m clip --adv -steps 1001 \
  -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24aug_clip_adv.log | tail -3

echo "defense-aug table done at $(date)"
