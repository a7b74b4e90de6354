#!/bin/bash
# Re-run of the one analysis-sweep leg that died to a TPU worker crash
# (PGD best-of-3, logs_analysis_sweep_r5.out leg 4/8).  Per-image fresh
# processes — the same isolation that rescued the fic and k24 legs.
#
# Usage: bash scripts/r5_tail2.sh [WAIT_PID]
set -u
cd /root/repo
mkdir -p logs

if [ $# -ge 1 ]; then
  echo "waiting for pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

PY="python -m imagecompression_adversarial_tpu.cli"
CK="ckpts/demo/hyper-q4-mse-synthetic.msgpack"

echo "### PGD multi-start (best of 3), 1001 steps, per-image  $(date)"
: > logs/r5_pgd3_rerun.log
for f in /tmp/kodak24/kodim01.png /tmp/kodak24/kodim02.png; do
  echo "--- $(basename $f)  $(date)"
  timeout 3600 $PY.attack_ifgsm -m hyper -q 4 -metric mse -ckpt $CK \
    -random 3 -steps 1001 -s "$f" 2>&1 \
    | grep '^kodim' >> logs/r5_pgd3_rerun.log \
    || echo "$(basename $f): FAILED" >> logs/r5_pgd3_rerun.log
done
cat logs/r5_pgd3_rerun.log

echo "tail2 done at $(date)"
