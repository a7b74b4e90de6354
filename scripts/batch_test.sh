#!/usr/bin/env bash
# Quality sweep against adversarially finetuned checkpoints
# (the reference's batch driver, /root/reference/batch_test.sh:1-5).
#
# usage: scripts/batch_test.sh <model> <metric> <source-glob> [ckpt-root]
set -euo pipefail

MODEL=${1:-hyper}
METRIC=${2:-mse}
SOURCE=${3:-"./datasets/kodak/kodim*.png"}
CKPT_ROOT=${4:-"./ckpts/adv"}

for Q in 1 2 3 4 5 6; do
  CKPT=$(ls -d "${CKPT_ROOT}/${MODEL}-"*"-${METRIC}"*/best_loss 2>/dev/null | head -1 || true)
  if [ -n "${CKPT}" ]; then
    python -m imagecompression_adversarial_tpu.cli.attack_rd \
      -m "${MODEL}" -metric "${METRIC}" -q "${Q}" -s "${SOURCE}" -ckpt "${CKPT}"
  else
    python -m imagecompression_adversarial_tpu.cli.attack_rd \
      -m "${MODEL}" -metric "${METRIC}" -q "${Q}" -s "${SOURCE}" --new
  fi
done
