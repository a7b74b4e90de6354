#!/bin/bash
# Re-run of the 4-anchor trained cross-model matrix leg from
# r5_anchors.sh: the original invocation cd'd to /tmp/anchors_matrix and
# lost the repo-root package import (ModuleNotFoundError) — the package
# is used from the source tree, so a cwd change needs PYTHONPATH.
#
# Usage: bash scripts/r5_anchors_matrix.sh [WAIT_PID]
set -u
cd /root/repo
mkdir -p logs

if [ $# -ge 1 ]; then
  echo "waiting for pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

specs="factorized:4:ckpts/demo/factorized-q4-mse-synthetic.msgpack"
specs="$specs,hyper:4:ckpts/demo/hyper-q4-mse-synthetic.msgpack"
specs="$specs,context:4:ckpts/demo/context-q4-mse-synthetic.msgpack"
specs="$specs,cheng2020:4:ckpts/demo/cheng2020-q4-mse-synthetic.msgpack"

echo "### 4-anchor trained cross-model matrix (301 steps)  $(date)"
mkdir -p /tmp/anchors_matrix
( cd /tmp/anchors_matrix && \
  PYTHONPATH=/root/repo:/root/.axon_site:${PYTHONPATH:-} timeout 14400 \
  python -m imagecompression_adversarial_tpu.cli.transfer_noise \
    --cross-model -steps 301 -s '/tmp/kodak24/kodim0[12].png' \
    -cross "factorized:4:/root/repo/ckpts/demo/factorized-q4-mse-synthetic.msgpack,hyper:4:/root/repo/ckpts/demo/hyper-q4-mse-synthetic.msgpack,context:4:/root/repo/ckpts/demo/context-q4-mse-synthetic.msgpack,cheng2020:4:/root/repo/ckpts/demo/cheng2020-q4-mse-synthetic.msgpack" \
  ) 2>&1 | tee logs/r5_anchors_matrix.log | tail -10
cp /tmp/anchors_matrix/transfer_cross_model.npy /root/repo/transfer_anchors.npy
cp /tmp/anchors_matrix/transfer_cross_model.pdf /root/repo/transfer_anchors.pdf

echo "anchors matrix leg done at $(date)"
