#!/bin/bash
# Resume the round-3 trained-adapter pipeline after the tic leg completed:
# invcompress + nlaic (train/export/attack/codec), the trained cross-model
# matrix, then the fic demo (scripts/r3_fic_demo.sh).  Sequential — ONE TPU
# process at a time.
set -u
cd /root/repo
mkdir -p logs ckpts/demo

ckpt_path() {  # invcompress is 415 MB fp16 (M=768) — regenerable, not committed
  if [ "$1" = invcompress ]; then echo /tmp/$1-q3-mse-synthetic.msgpack
  else echo ckpts/demo/$1-q3-mse-synthetic.msgpack; fi
}

rm -rf ckpts/anchor/invcompress-0.0067-mse  # interrupted partial run

for fam in invcompress nlaic; do
  ck=$(ckpt_path $fam)
  echo "=== train $fam (2000 steps, synthetic) ==="
  timeout 9000 python -m imagecompression_adversarial_tpu.cli.train \
    -m $fam -q 3 -metric mse -max_steps 2000 \
    2>&1 | tee logs/r3_train_$fam.log | tail -4
  echo "=== export $fam ==="
  timeout 1800 python scripts/export_ckpt.py ckpts/anchor/$fam-0.0067-mse \
    -m $fam -q 3 -o $ck 2>&1 | tail -2
  echo "=== attack $fam (1001 steps) ==="
  timeout 9000 python -m imagecompression_adversarial_tpu.cli.attack_rd \
    -m $fam -q 3 -metric mse -ckpt $ck \
    -steps 1001 -s '/tmp/kodak_synth/kodim*.png' \
    2>&1 | tee logs/r3_attack_$fam.log | tail -4
  echo "=== real codec $fam (384x256: bounds the AR host decode) ==="
  timeout 5400 python -m imagecompression_adversarial_tpu.cli.codec \
    -m $fam -q 3 -metric mse -ckpt $ck \
    -s /tmp/kodak_synth/small01.png -t /tmp/r3_${fam}_dec.png \
    2>&1 | tee logs/r3_codec_$fam.log | tail -5
done

echo "=== trained cross-model transfer matrix ==="
timeout 12000 python -m imagecompression_adversarial_tpu.cli.transfer_noise \
  --cross-model -steps 301 -s '/tmp/kodak_synth/kodim*.png' \
  -cross "hyper:4:ckpts/demo/hyper-q4-mse-synthetic.msgpack,tic:3:$(ckpt_path tic),invcompress:3:$(ckpt_path invcompress),nlaic:3:$(ckpt_path nlaic)" \
  2>&1 | tee logs/r3_crossmodel.log | tail -12

bash scripts/r3_fic_demo.sh
echo "=== resume pipeline done ==="
