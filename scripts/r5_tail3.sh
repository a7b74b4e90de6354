#!/bin/bash
# Second re-run of the PGD multi-start leg, after fixing the root cause:
# best_of_multistart vmapped the whole 1001-step attack (3x live HBM),
# which crashes the v5e worker at 768x512.  attacks/ifgsm.py now runs the
# starts sequentially against one compiled executable.
#
# Usage: bash scripts/r5_tail3.sh [WAIT_PID]
set -u
cd /root/repo
mkdir -p logs

if [ $# -ge 1 ]; then
  echo "waiting for pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

PY="python -m imagecompression_adversarial_tpu.cli"
CK="ckpts/demo/hyper-q4-mse-synthetic.msgpack"

echo "### PGD multi-start (best of 3, sequential), 1001 steps  $(date)"
: > logs/r5_pgd3_rerun2.log
for f in /tmp/kodak24/kodim01.png /tmp/kodak24/kodim02.png; do
  echo "--- $(basename $f)  $(date)"
  timeout 3600 $PY.attack_ifgsm -m hyper -q 4 -metric mse -ckpt $CK \
    -random 3 -steps 1001 -s "$f" 2>&1 \
    | grep '^kodim' >> logs/r5_pgd3_rerun2.log \
    || echo "$(basename $f): FAILED" >> logs/r5_pgd3_rerun2.log
done
cat logs/r5_pgd3_rerun2.log

echo "tail3 done at $(date)"
