#!/bin/bash
# Replacement sequencer after the anchors-matrix leg failure (import
# error in a /tmp cwd).  Waits for the in-flight anchors_k24 script,
# then: fixed 4-anchor matrix -> k24 retry -> defense_aug -> tail3.
#
# Usage: bash scripts/r5_chain3.sh <ANCHORS_K24_SHELL_PID>
set -u
cd /root/repo

if [ $# -ge 1 ]; then
  echo "waiting for anchors_k24 leg pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

echo "=== chain3: anchors_matrix  $(date)"
bash scripts/r5_anchors_matrix.sh > logs_anchors_matrix_r5.out 2>&1

echo "=== chain3: k24_retry  $(date)"
bash scripts/r5_k24_retry.sh > logs_k24_retry_r5.out 2>&1

echo "=== chain3: defense_aug  $(date)"
bash scripts/r5_defense_aug.sh > logs_defense_aug_r5.out 2>&1

echo "=== chain3: tail3 (PGD3, sequential multistart)  $(date)"
bash scripts/r5_tail3.sh > logs_tail3_r5.out 2>&1

echo "=== chain3 done  $(date)"
