#!/bin/bash
# Follow-up to scripts/r5_kodak24.sh: corpus-scale defense + analysis
# tables (the reference averages these over Kodak too:
# /root/reference/self_ensemble.py:328-441, random_noise.py:113-164,
# recompression.py:65-69), then the fresh perf floors + profiler trace
# (CLAUDE.md "remaining leads": the old floor numbers were a different VM
# epoch — re-measure before any perf work).
#
# Usage: bash scripts/r5_kodak24b.sh [WAIT_PID]
set -u
cd /root/repo
mkdir -p logs

if [ $# -ge 1 ]; then
  echo "waiting for pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

PY="python -m imagecompression_adversarial_tpu.cli"
CK="ckpts/demo/hyper-q4-mse-synthetic.msgpack"

echo "### [1/7] self-ensemble defense (non-adaptive), Kodak-24  $(date)"
timeout 10800 $PY.self_ensemble -m hyper -q 4 -metric mse -ckpt $CK \
  --defend -steps 1001 -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24_defend.log | tail -3

echo "### [2/7] self-ensemble defense (ADAPTIVE attack), Kodak-24  $(date)"
timeout 14400 $PY.self_ensemble -m hyper -q 4 -metric mse -ckpt $CK \
  --defend --adv -steps 1001 -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24_defend_adv.log | tail -3

echo "### [3/7] latent range profile (q4 synthetic), Kodak-24  $(date)"
timeout 7200 $PY.feature_range -m hyper -q 4 -metric mse -ckpt $CK \
  -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24_feature_range.log | tail -3

echo "### [4/7] adaptive latent-clip defense, Kodak-24  $(date)"
timeout 14400 $PY.self_ensemble -m hyper -q 4 -metric mse -ckpt $CK \
  --defend --defend_m clip --adv -steps 1001 \
  -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24_clip_adv.log | tail -3

echo "### [5/7] random-noise amplification, Kodak-24  $(date)"
timeout 7200 $PY.random_noise -m hyper -q 4 -metric mse -ckpt $CK \
  -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24_noise.log | tail -3

echo "### [6/7] recompression stability x50, Kodak-24  $(date)"
timeout 7200 $PY.recompression -m hyper -q 4 -metric mse -ckpt $CK \
  -re 50 -s '/tmp/kodak24/kodim*.png' 2>&1 \
  | tee logs/r5_k24_recompress.log | tail -3

echo "### [7/7] fresh perf floors + profiler trace (this VM epoch)  $(date)"
timeout 10800 python scripts/perf_attack_variants.py 2>&1 \
  | tee logs/r5_perf_floors.log | tail -15
rm -rf /tmp/r5_trace
timeout 7200 $PY.attack_rd -m hyper -q 4 -metric mse -ckpt $CK \
  -steps 1001 -precision default -trace /tmp/r5_trace \
  -s '/tmp/kodak24/kodim01.png' 2>&1 \
  | tee logs/r5_trace_attack.log | tail -3
timeout 1200 python scripts/parse_trace.py /tmp/r5_trace --steps 1001 --top 30 \
  2>&1 | tee logs/r5_trace_parsed.log | tail -25

echo "kodak24b follow-ups done at $(date)"
