#!/bin/bash
# Trained demos for the three CompressAI ANCHOR families that so far only
# have random-weight evidence (factorized / context=mbt2018 / cheng2020),
# then the reference's EXACT anchor-set cross-model matrix
# {factorized, hyper, context, cheng2020}
# (/root/reference/transfer_noise.py:44-79 runs precisely this set; the
# committed 7-family matrix covers the adapter families instead).
#
# The matrix leg runs from a scratch cwd because cli.transfer_noise writes
# hardcoded transfer_cross_model.{npy,pdf} — the 7-family artifacts at the
# repo root must not be overwritten; copies land as transfer_anchors.{npy,pdf}.
#
# Usage: bash scripts/r5_anchors.sh [WAIT_PID]
set -u
cd /root/repo
mkdir -p logs ckpts/demo

if [ $# -ge 1 ]; then
  echo "waiting for pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

PY="python -m imagecompression_adversarial_tpu.cli"

for m in factorized context cheng2020; do
  ck=ckpts/demo/${m}-q4-mse-synthetic.msgpack
  echo "### train $m q4 mse (2000 steps, synthetic)  $(date)"
  timeout 10800 $PY.train -m $m -q 4 -metric mse -max_steps 2000 \
    2>&1 | tee logs/r5_train_${m}_q4.log | tail -4
  ckdir=$(grep -o "'ckpt_dir': '[^']*'" logs/r5_train_${m}_q4.log \
          | tail -1 | cut -d"'" -f4)
  echo "### export $m (from $ckdir)  $(date)"
  timeout 1800 python scripts/export_ckpt.py "$ckdir" -m $m -q 4 -o $ck \
    2>&1 | tail -2
  echo "### attack $m q4 trained (1001 steps)  $(date)"
  timeout 9000 $PY.attack_rd -m $m -q 4 -metric mse -ckpt $ck \
    -steps 1001 -s '/tmp/kodak24/kodim0[12].png' 2>&1 \
    | tee logs/r5_attack_${m}_q4.log | tail -3
done

specs="factorized:4:/root/repo/ckpts/demo/factorized-q4-mse-synthetic.msgpack"
specs="$specs,hyper:4:/root/repo/ckpts/demo/hyper-q4-mse-synthetic.msgpack"
specs="$specs,context:4:/root/repo/ckpts/demo/context-q4-mse-synthetic.msgpack"
specs="$specs,cheng2020:4:/root/repo/ckpts/demo/cheng2020-q4-mse-synthetic.msgpack"

echo "### 4-anchor trained cross-model matrix (301 steps)  $(date)"
mkdir -p /tmp/anchors_matrix
( cd /tmp/anchors_matrix && \
  PYTHONPATH=/root/repo:/root/.axon_site:${PYTHONPATH:-} timeout 14400 \
  python -m imagecompression_adversarial_tpu.cli.transfer_noise \
    --cross-model -steps 301 -s '/tmp/kodak24/kodim0[12].png' \
    -cross "$specs" ) 2>&1 | tee logs/r5_anchors_matrix.log | tail -10
cp /tmp/anchors_matrix/transfer_cross_model.npy /root/repo/transfer_anchors.npy
cp /tmp/anchors_matrix/transfer_cross_model.pdf /root/repo/transfer_anchors.pdf

echo "anchors leg done at $(date)"
