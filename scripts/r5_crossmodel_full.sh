#!/bin/bash
# Round-5 capstone re-run: the FULL trained cross-model transfer matrix over
# all 7 trained families — the reference's headline transferability
# experiment (`/root/reference/transfer_noise.py:44-79`).  Uses the lazy
# (thunk) legs of analysis.cross_model_matrix so at most ONE model's params
# + compiled attack scan are resident in HBM at a time (the eager round-5
# attempt died RESOURCE_EXHAUSTED holding all 7).
set -u
cd /root/repo
mkdir -p logs

specs="hyper:4:ckpts/demo/hyper-q4-mse-synthetic.msgpack"
specs="$specs,cheng2020-gmm:3:ckpts/demo/cheng2020-gmm-q3-mse-synthetic.msgpack"
specs="$specs,tic:3:ckpts/demo/tic-q3-mse-synthetic.msgpack"
specs="$specs,nlaic:3:ckpts/demo/nlaic-q3-mse-synthetic.msgpack"
specs="$specs,fic:3:ckpts/demo/fic-q3-mse-synthetic.msgpack"
specs="$specs,invcompress:3:/tmp/invcompress-q3-mse-synthetic.msgpack"
specs="$specs,hific:1:/tmp/hific-q1-synthetic.msgpack"

echo "=== full trained cross-model matrix (lazy legs): $specs ==="
timeout 14400 python -m imagecompression_adversarial_tpu.cli.transfer_noise \
  --cross-model -steps 301 -s '/tmp/kodak_synth/kodim0[12].png' \
  -cross "$specs" \
  2>&1 | tee logs/r5_crossmodel_full.log
echo "=== full matrix rerun done at $(date) ==="
