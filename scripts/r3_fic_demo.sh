#!/bin/bash
# Round-3 follow-up: trained fic (Weixin2021) demo — gives the new context4
# real coder (entropy/codec.py) trained-weight evidence in the style of the
# round-2 GMM demo (real bpp vs estimate on a trained model), plus a trained
# attack number for the family (zero-init is a critical point: -random 2,
# see RESULTS.md round 2).  Sequential — ONE TPU process at a time.
set -u
cd /root/repo
mkdir -p logs ckpts/demo

ck=ckpts/demo/fic-q3-mse-synthetic.msgpack

echo "=== train fic (2000 steps, synthetic) ==="
timeout 9000 python -m imagecompression_adversarial_tpu.cli.train \
  -m fic -q 3 -metric mse -max_steps 2000 \
  2>&1 | tee logs/r3_train_fic.log | tail -4
echo "=== export fic ==="
timeout 1800 python scripts/export_ckpt.py ckpts/anchor/fic-0.0067-mse \
  -m fic -q 3 -o $ck 2>&1 | tail -2
echo "=== attack fic (1001 steps, uniform init) ==="
timeout 9000 python -m imagecompression_adversarial_tpu.cli.attack_rd \
  -m fic -q 3 -metric mse -ckpt $ck -random 2 \
  -steps 1001 -s '/tmp/kodak_synth/kodim*.png' \
  2>&1 | tee logs/r3_attack_fic.log | tail -4
echo "=== real codec fic (context4 4-pass coder, 384x256) ==="
timeout 5400 python -m imagecompression_adversarial_tpu.cli.codec \
  -m fic -q 3 -metric mse -ckpt $ck \
  -s /tmp/kodak_synth/small01.png -t /tmp/r3_fic_dec.png \
  2>&1 | tee logs/r3_codec_fic.log | tail -5
echo "=== fic demo done ==="
