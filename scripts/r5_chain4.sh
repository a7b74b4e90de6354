#!/bin/bash
# Final sequencer: waits for the in-flight k24_retry script, then runs
# the matrix leg (now with the axon site dir preserved on PYTHONPATH —
# the previous attempt overwrote it and lost the TPU backend plugin),
# then defense_aug and the PGD3 re-run.
#
# Usage: bash scripts/r5_chain4.sh <K24_RETRY_SHELL_PID>
set -u
cd /root/repo

if [ $# -ge 1 ]; then
  echo "waiting for k24_retry leg pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

echo "=== chain4: anchors_matrix  $(date)"
bash scripts/r5_anchors_matrix.sh > logs_anchors_matrix_r5.out 2>&1

echo "=== chain4: defense_aug  $(date)"
bash scripts/r5_defense_aug.sh > logs_defense_aug_r5.out 2>&1

echo "=== chain4: tail3 (PGD3, sequential multistart)  $(date)"
bash scripts/r5_tail3.sh > logs_tail3_r5.out 2>&1

echo "=== chain4 done  $(date)"
