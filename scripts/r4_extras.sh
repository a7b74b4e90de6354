#!/bin/bash
# Round-4 follow-ups after the trained-demo pipeline (VERDICT r3 next #3,
# #5, #7): tic real-vs-est recheck under the clamp-aware estimate, the
# full-length adaptive-clip defense number, the profiler trace at the
# 210 steps/s phase config, and the corpus batch-attack A/B.
# Sequential — ONE TPU process at a time.
set -u
cd /root/repo
mkdir -p logs

echo "=== tic codec recheck (clamp-aware estimate, VERDICT #3) ==="
timeout 5400 python -m imagecompression_adversarial_tpu.cli.codec \
  -m tic -q 3 -metric mse -ckpt ckpts/demo/tic-q3-mse-synthetic.msgpack \
  -s /tmp/kodak_synth/small01.png -t /tmp/r4_tic_dec.png \
  2>&1 | tee logs/r4_codec_tic.log | tail -5

echo "=== latent range profile (hyper q4 augmented) ==="
timeout 3600 python -m imagecompression_adversarial_tpu.cli.feature_range \
  -m hyper -q 4 -metric mse -ckpt ckpts/demo/hyper-q4-mse-augmented.msgpack \
  -s '/tmp/kodak_synth/kodim*.png' \
  2>&1 | tee logs/r4_feature_range.log | tail -3

echo "=== adaptive-clip defense, 1001 steps (VERDICT #7) ==="
timeout 9000 python -m imagecompression_adversarial_tpu.cli.self_ensemble \
  -m hyper -q 4 -metric mse -ckpt ckpts/demo/hyper-q4-mse-augmented.msgpack \
  --defend --defend_m clip --adv -steps 1001 \
  -s '/tmp/kodak_synth/kodim*.png' \
  2>&1 | tee logs/r4_adaptive_clip.log | tail -4

echo "=== profiler trace at the phase config (VERDICT #5) ==="
rm -rf /tmp/r4_trace
timeout 5400 python -m imagecompression_adversarial_tpu.cli.attack_rd \
  -m hyper -q 1 --new -steps 1001 -precision default \
  -s '/tmp/kodak_synth/kodim01.png' -trace /tmp/r4_trace \
  2>&1 | tee logs/r4_trace_attack.log | tail -3
timeout 1200 python scripts/parse_trace.py /tmp/r4_trace --steps 1001 --top 30 \
  2>&1 | tee logs/r4_trace_parsed.log | tail -25

echo "=== corpus batch A/B: 4 singles vs attack_batch 4 (VERDICT #5) ==="
python - <<'EOF'
import numpy as np
from PIL import Image
rng = np.random.RandomState(1)
for i in (3, 4):
    h, w = 512, 768
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.clip(np.stack([0.5+0.4*np.sin(xx/37.0+i), 0.5+0.4*np.cos(yy/55.0+i),
                            0.5+0.2*np.sin((xx+yy)/28.0)], -1)
                  + rng.rand(h, w, 3)*0.05, 0, 1)
    Image.fromarray((img*255).astype(np.uint8)).save(f"/tmp/kodak_synth/kodim{i:02d}.png")
EOF
timeout 5400 python -m imagecompression_adversarial_tpu.cli.attack_rd \
  -m hyper -q 1 --new -steps 1001 -precision default \
  -s '/tmp/kodak_synth/kodim*.png' \
  2>&1 | tee logs/r4_corpus_single.log | tail -2
timeout 5400 python -m imagecompression_adversarial_tpu.cli.attack_rd \
  -m hyper -q 1 --new -steps 1001 -precision default -attack_batch 4 \
  -s '/tmp/kodak_synth/kodim*.png' \
  2>&1 | tee logs/r4_corpus_batch4.log | tail -2

echo "=== bench (trained-ckpt vi + steps/s) ==="
timeout 3600 python bench.py 2>&1 | tee logs/r4_bench.log | tail -2
echo "=== r4 extras done ==="
