#!/bin/bash
# Kodak-24 reference-scale evaluation.
#
# The reference's headline tables average attack_rd over the 24-image Kodak
# set (/root/reference/attack_rd.py:654-688 accumulates per-image rows and
# prints the AVG over the kodim glob).  Rounds 1-5 demos ran on a 2-image
# subset; this pipeline produces the full-corpus numbers on the synthetic
# Kodak-geometry corpus (scripts/make_kodak24.py): per-family 1001-step
# trained-weight attacks + the RD eval table.
#
# Run AFTER any other TPU client has exited (never two TPU processes).
set -u
cd /root/repo
mkdir -p logs
python scripts/make_kodak24.py /tmp/kodak24

PY="python -m imagecompression_adversarial_tpu.cli"

echo "### [1/8] RD eval over Kodak-24 (trained hyper q4)  $(date)"
timeout 7200 $PY.test -m hyper -q 4 -metric mse \
  -ckpt ckpts/demo/hyper-q4-mse-synthetic.msgpack \
  -s '/tmp/kodak24/kodim*.png' 2>&1 | tee logs/r5_k24_test_hyper.log | tail -3

echo "### [2/8] headline attack: hyper q4 trained, 1001 steps  $(date)"
timeout 10800 $PY.attack_rd -m hyper -q 4 -metric mse \
  -ckpt ckpts/demo/hyper-q4-mse-synthetic.msgpack \
  -steps 1001 -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24_hyper.log | tail -3

echo "### [3/8] cheng2020-gmm q3 trained, 1001 steps  $(date)"
timeout 10800 $PY.attack_rd -m cheng2020-gmm -q 3 -metric mse \
  -ckpt ckpts/demo/cheng2020-gmm-q3-mse-synthetic.msgpack \
  -steps 1001 -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24_cheng.log | tail -3

echo "### [4/8] tic q3 trained, 1001 steps  $(date)"
timeout 10800 $PY.attack_rd -m tic -q 3 -metric mse \
  -ckpt ckpts/demo/tic-q3-mse-synthetic.msgpack \
  -steps 1001 -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24_tic.log | tail -3

echo "### [5/8] nlaic q3 trained, 1001 steps  $(date)"
timeout 10800 $PY.attack_rd -m nlaic -q 3 -metric mse \
  -ckpt ckpts/demo/nlaic-q3-mse-synthetic.msgpack \
  -steps 1001 -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24_nlaic.log | tail -3

echo "### [6/8] invcompress q3 trained, 1001 steps  $(date)"
timeout 14400 $PY.attack_rd -m invcompress -q 3 -metric mse \
  -ckpt /tmp/invcompress-q3-mse-synthetic.msgpack \
  -steps 1001 -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24_invcompress.log | tail -3

echo "### [7/8] fic q3 trained, 1001 steps, best-of-2 host restarts  $(date)"
timeout 14400 $PY.attack_rd -m fic -q 3 -metric mse \
  -ckpt ckpts/demo/fic-q3-mse-synthetic.msgpack \
  -random 2 -steps 1001 -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24_fic.log | tail -3

echo "### [8/8] hific q1 trained, 1001 steps  $(date)"
timeout 14400 $PY.attack_rd -m hific -q 1 -metric mse \
  -ckpt /tmp/hific-q1-synthetic.msgpack \
  -steps 1001 -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24_hific.log | tail -3

echo "kodak24 pipeline done at $(date)"
