#!/bin/bash
# Round-4 master TPU pipeline (VERDICT r3 "next round" items, in order).
# Sequential — ONE TPU process at a time; run with run_in_background and a
# generous timeout; NEVER kill mid-compile (axon wedge, CLAUDE.md).
set -u
cd /root/repo
mkdir -p logs

echo "######## [1/4] on-chip verify drive (round-4 code) ########"
timeout 3600 python -m imagecompression_adversarial_tpu.cli.attack_rd \
  -m hyper -q 4 -metric mse -ckpt ckpts/demo/hyper-q4-mse-synthetic.msgpack \
  -steps 101 -s '/tmp/kodak_synth/kodim*.png' \
  2>&1 | tee logs/r4_verify_drive.log | tail -4

echo "######## [2/4] resume r3 trained-demo pipeline ########"
bash scripts/r3_resume_demos.sh 2>&1 | tee logs/r4_resume_wrapper.log | tail -30

echo "######## [3/4] trained HiFiC demo ########"
bash scripts/r4_hific_demo.sh

echo "######## [4/4] r4 extras (tic recheck, adaptive clip, trace, batch A/B, bench) ########"
bash scripts/r4_extras.sh
echo "######## r4 pipeline done ########"
