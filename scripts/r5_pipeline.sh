#!/bin/bash
# Round-5 TPU queue (VERDICT r4 next-round items).  Waits for the round-4
# pipeline (hific demo + extras, still in flight at round start) to exit,
# then runs sequentially — ONE TPU process at a time, never killed
# mid-compile (axon wedge, CLAUDE.md).
#
# Legs:
#   1. bench adjudication: two fresh-process runs on the idle chip
#      (VERDICT #2; bench.py now self-checks vs a fwd-only scan)
#   2. fic attack re-run (leg crashed with a TPU worker fault at 03:19)
#   3. AR-family codec audits with the new ideal_bpp three-way split
#      (VERDICT #3: localize the invcompress -12% / nlaic +13% gaps)
#   4. 12.6 MP twice-in-one-process (VERDICT #4)
#   5. adversarial training at reference scale: 2000 steps x 300-step
#      inner attacks (ref README.md:29 + train.py:455-456), from the
#      trained anchor; 1001-step attack before/after (VERDICT #5)
#   6. full 6-family trained cross-model matrix (r4_crossmodel_full.sh)
set -u
cd /root/repo
mkdir -p logs

R4_PID="${1:-1265}"
echo "waiting for r4 pipeline (pid $R4_PID) to exit..."
while kill -0 "$R4_PID" 2>/dev/null; do sleep 60; done
echo "r4 pipeline done; starting r5 queue at $(date)"

echo "######## [1/6] bench adjudication (idle chip, twice) ########"
timeout 3600 python bench.py 2>&1 | tee logs/r5_bench_a.log | tail -2
sleep 5
timeout 3600 python bench.py 2>&1 | tee logs/r5_bench_b.log | tail -2

echo "######## [2/6] fic attack re-run (worker-fault casualty) ########"
timeout 9000 python -m imagecompression_adversarial_tpu.cli.attack_rd \
  -m fic -q 3 -metric mse -ckpt ckpts/demo/fic-q3-mse-synthetic.msgpack \
  -random 2 -steps 1001 -s '/tmp/kodak_synth/kodim0[12].png' \
  2>&1 | tee logs/r5_attack_fic.log | tail -4

echo "######## [3/6] AR codec audits (ideal_bpp three-way split) ########"
timeout 5400 python -m imagecompression_adversarial_tpu.cli.codec \
  -m nlaic -q 3 -metric mse -ckpt ckpts/demo/nlaic-q3-mse-synthetic.msgpack \
  -s /tmp/kodak_synth/small01.png -t /tmp/r5_nlaic_dec.png \
  2>&1 | tee logs/r5_codec_nlaic.log | tail -2
timeout 5400 python -m imagecompression_adversarial_tpu.cli.codec \
  -m invcompress -q 3 -metric mse -ckpt /tmp/invcompress-q3-mse-synthetic.msgpack \
  -s /tmp/kodak_synth/small01.png -t /tmp/r5_invcompress_dec.png \
  2>&1 | tee logs/r5_codec_invcompress.log | tail -2
# fic again under the means-free estimate fix (the 03:21 run pre-dates it)
timeout 5400 python -m imagecompression_adversarial_tpu.cli.codec \
  -m fic -q 3 -metric mse -ckpt ckpts/demo/fic-q3-mse-synthetic.msgpack \
  -s /tmp/kodak_synth/small01.png -t /tmp/r5_fic_dec.png \
  2>&1 | tee logs/r5_codec_fic.log | tail -2

echo "######## [4/6] 12.6 MP twice in one process ########"
timeout 10800 python scripts/r4_bigimage_twice.py \
  2>&1 | tee logs/r5_bigimage_twice.log | tail -6

echo "######## [5/6] adversarial training at reference scale ########"
rm -rf ckpts/adv/hyper-* 2>/dev/null
timeout 14400 python -m imagecompression_adversarial_tpu.cli.train \
  --adv -m hyper -q 4 -metric mse -steps 300 -noise 0.0001 \
  -lr_train 1e-5 -max_steps 2000 \
  -ckpt ckpts/demo/hyper-q4-mse-synthetic.msgpack \
  2>&1 | tee logs/r5_advtrain2000.log | tail -4
ck_adv=$(ls -d ckpts/adv/hyper-* 2>/dev/null | tail -1)
echo "exporting adv ckpt from $ck_adv"
timeout 1800 python scripts/export_ckpt.py "$ck_adv" \
  -m hyper -q 4 -o /tmp/hyper-q4-advtuned2000.msgpack 2>&1 | tail -2
echo "=== attack before (anchor) / after (advtuned-2000) ==="
timeout 9000 python -m imagecompression_adversarial_tpu.cli.attack_rd \
  -m hyper -q 4 -metric mse -ckpt ckpts/demo/hyper-q4-mse-synthetic.msgpack \
  -steps 1001 -s '/tmp/kodak_synth/kodim0[12].png' \
  2>&1 | tee logs/r5_attack_before.log | tail -2
timeout 9000 python -m imagecompression_adversarial_tpu.cli.attack_rd \
  -m hyper -q 4 -metric mse -ckpt /tmp/hyper-q4-advtuned2000.msgpack \
  -steps 1001 -s '/tmp/kodak_synth/kodim0[12].png' \
  2>&1 | tee logs/r5_attack_after.log | tail -2

echo "######## [6/6] full 6-family trained cross-model matrix ########"
bash scripts/r4_crossmodel_full.sh 2>&1 | tail -14
echo "######## r5 pipeline done at $(date) ########"
