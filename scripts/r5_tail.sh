#!/bin/bash
# Final chained TPU legs (after scripts/r5_followups.sh): the fic codec
# audit under the means-free estimate fix (the in-queue copy of this leg
# was skipped — the running script was edited, a mistake not to repeat).
set -u
cd /root/repo
FU_PID="${1:?followups pid}"
while kill -0 "$FU_PID" 2>/dev/null; do sleep 60; done
echo "followups done; tail legs at $(date)"
timeout 5400 python -m imagecompression_adversarial_tpu.cli.codec \
  -m fic -q 3 -metric mse -ckpt ckpts/demo/fic-q3-mse-synthetic.msgpack \
  -s /tmp/kodak_synth/small01.png -t /tmp/r5_fic_dec.png \
  2>&1 | tee logs/r5_codec_fic.log | tail -2
echo "tail legs done at $(date)"
