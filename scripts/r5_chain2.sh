#!/bin/bash
# Master sequencer for the remaining round-5 legs.  One process, strictly
# sequential — avoids the setsid-$! trap where each leg waited on a
# wrapper pid that had already exited, so all legs started concurrently.
#
# Usage: bash scripts/r5_chain2.sh <ANCHORS_SHELL_PID>
set -u
cd /root/repo

if [ $# -ge 1 ]; then
  echo "waiting for anchors leg pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

echo "=== chain2: anchors_k24  $(date)"
bash scripts/r5_anchors_k24.sh > logs_anchors_k24_r5.out 2>&1

echo "=== chain2: k24_retry  $(date)"
bash scripts/r5_k24_retry.sh > logs_k24_retry_r5.out 2>&1

echo "=== chain2: defense_aug  $(date)"
bash scripts/r5_defense_aug.sh > logs_defense_aug_r5.out 2>&1

echo "=== chain2: tail3 (PGD3, sequential multistart)  $(date)"
bash scripts/r5_tail3.sh > logs_tail3_r5.out 2>&1

echo "=== chain2 done  $(date)"
