#!/bin/bash
# Quality-axis trained demos: the reference evaluates the RD attack across
# the full quality range (q 1..8 lambda table, /root/reference/train.py:255-258;
# quality loop /root/reference/attack_rd.py:712-715).  Committed demos so
# far pin q=4; this trains hyper at q=1/2/6/8 (2000-step synthetic recipe)
# and attacks each, giving the VI-vs-quality curve the paper reports
# (vulnerability varies with rate).
#
# Usage: bash scripts/r5_quality_axis.sh [WAIT_PID]
set -u
cd /root/repo
mkdir -p logs ckpts/demo

if [ $# -ge 1 ]; then
  echo "waiting for pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

PY="python -m imagecompression_adversarial_tpu.cli"

lamb_for_q() {  # str() of the mse lambda table entry = anchor dir component
  case "$1" in
    1) echo 0.0018;; 2) echo 0.0035;; 6) echo 0.0483;; 8) echo 0.18;;
  esac
}

for q in 1 2 6 8; do
  lamb=$(lamb_for_q $q)
  ck=ckpts/demo/hyper-q${q}-mse-synthetic.msgpack
  echo "### train hyper q$q mse (2000 steps, synthetic)  $(date)"
  timeout 9000 $PY.train -m hyper -q $q -metric mse -max_steps 2000 \
    2>&1 | tee logs/r5_train_hyper_q${q}.log | tail -4
  echo "### export q$q  $(date)"
  timeout 1800 python scripts/export_ckpt.py ckpts/anchor/hyper-${lamb}-mse \
    -m hyper -q $q -o $ck 2>&1 | tail -2
  echo "### attack hyper q$q trained (1001 steps)  $(date)"
  timeout 9000 $PY.attack_rd -m hyper -q $q -metric mse -ckpt $ck \
    -steps 1001 -s '/tmp/kodak24/kodim0[12].png' 2>&1 \
    | tee logs/r5_attack_hyper_q${q}.log | tail -3
done

echo "### attack hyper q4 trained (1001 steps) — curve midpoint  $(date)"
timeout 9000 $PY.attack_rd -m hyper -q 4 -metric mse \
  -ckpt ckpts/demo/hyper-q4-mse-synthetic.msgpack \
  -steps 1001 -s '/tmp/kodak24/kodim0[12].png' 2>&1 \
  | tee logs/r5_attack_hyper_q4.log | tail -3

echo "quality-axis demos done at $(date)"
