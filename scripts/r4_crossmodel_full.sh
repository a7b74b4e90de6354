#!/bin/bash
# Round-4 capstone: the FULL trained cross-model transfer matrix over every
# trained family in the sandbox — the reference's headline transferability
# experiment (`/root/reference/transfer_noise.py:44-79`) at maximum breadth.
# Run AFTER scripts/r4_pipeline.sh (it consumes the ckpts that pipeline
# trains: /tmp/invcompress..., /tmp/hific..., ckpts/demo/{nlaic,fic}...).
# Sequential — ONE TPU process at a time.
set -u
cd /root/repo
mkdir -p logs

specs="hyper:4:ckpts/demo/hyper-q4-mse-synthetic.msgpack"
specs="$specs,cheng2020-gmm:3:ckpts/demo/cheng2020-gmm-q3-mse-synthetic.msgpack"
specs="$specs,tic:3:ckpts/demo/tic-q3-mse-synthetic.msgpack"
for f in nlaic fic; do
  ck=ckpts/demo/$f-q3-mse-synthetic.msgpack
  [ -f "$ck" ] && specs="$specs,$f:3:$ck" || echo "skip $f (no $ck)"
done
[ -f /tmp/invcompress-q3-mse-synthetic.msgpack ] \
  && specs="$specs,invcompress:3:/tmp/invcompress-q3-mse-synthetic.msgpack" \
  || echo "skip invcompress (no /tmp ckpt)"
[ -f /tmp/hific-q1-synthetic.msgpack ] \
  && specs="$specs,hific:1:/tmp/hific-q1-synthetic.msgpack" \
  || echo "skip hific (no /tmp ckpt)"

echo "=== full trained cross-model matrix: $specs ==="
timeout 14400 python -m imagecompression_adversarial_tpu.cli.transfer_noise \
  --cross-model -steps 301 -s '/tmp/kodak_synth/kodim0[12].png' \
  -cross "$specs" \
  2>&1 | tee logs/r4_crossmodel_full.log | tail -15
echo "=== full matrix done ==="
