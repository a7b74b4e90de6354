#!/bin/bash
# Round-5 engine-demo sweep: trained-weight on-chip demos for the attack
# engines that so far only have unit-test / random-weight evidence —
# targeted (attack_cv), ROI-masked, patch, adversarial dataset generator,
# MNIST-style classifier.  Waits for the cross-model matrix (never two TPU
# processes).  References: /root/reference/attack_cv.py:346+,
# attack_patch.py:351-365, attack_data.py:246-268, classifier-train.py:34-75.
set -u
cd /root/repo
mkdir -p logs

if [ -f /tmp/crossmodel.pid ]; then
  while kill -0 "$(cat /tmp/crossmodel.pid)" 2>/dev/null; do sleep 60; done
fi

CK=ckpts/demo/hyper-q4-mse-synthetic.msgpack

echo "######## [1/6] targeted attack (kodim01 -> kodim02) ########"
timeout 3600 python -m imagecompression_adversarial_tpu.cli.attack_cv \
  -m hyper -q 4 -ckpt $CK -steps 1001 \
  -s /tmp/kodak_synth/kodim01.png -t /tmp/kodak_synth/kodim02.png \
  2>&1 | tee logs/r5_targeted.log | tail -4

echo "######## [2/6] ROI-masked attack (box 200..500 x 100..400) ########"
timeout 3600 python -m imagecompression_adversarial_tpu.cli.attack_cv \
  -m hyper -q 4 -ckpt $CK -steps 1001 \
  -s /tmp/kodak_synth/kodim01.png --mask_loc 200 500 100 400 \
  -att_metric masked -la_tar 5 \
  2>&1 | tee logs/r5_roi.log | tail -4

echo "######## [3/6] patch attack (worst 64x64) ########"
timeout 3600 python -m imagecompression_adversarial_tpu.cli.attack_patch \
  -m hyper -q 4 -ckpt $CK -steps 1001 \
  -s '/tmp/kodak_synth/kodim0[12].png' \
  2>&1 | tee logs/r5_patch.log | tail -4

echo "######## [4/6] adversarial dataset generator ########"
timeout 3600 python -m imagecompression_adversarial_tpu.cli.attack_data \
  -m hyper -q 4 -ckpt $CK -steps 301 \
  -s '/tmp/kodak_synth/kodim0[12].png' -out /tmp/adv_dataset \
  2>&1 | tee logs/r5_attack_data.log | tail -4

echo "######## [5/6] classifier train (synthetic labeled stream) ########"
timeout 1800 python -m imagecompression_adversarial_tpu.cli.classifier_train \
  -steps 300 -device cpu -ckpt /tmp/classifier.msgpack \
  2>&1 | tee logs/r5_classifier.log | tail -4

echo "######## [6/6] classifier-CE targeted attack (label 3) ########"
timeout 3600 python -m imagecompression_adversarial_tpu.cli.attack_cv \
  -m hyper -q 4 -ckpt $CK -steps 1001 \
  -s /tmp/kodak_synth/kodim01.png \
  --cls_ckpt /tmp/classifier.msgpack --cls_label 3 \
  2>&1 | tee logs/r5_cls_attack.log | tail -4

echo "######## r5 engine demos done at $(date) ########"
