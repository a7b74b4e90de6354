#!/bin/bash
# Round-4: trained HiFiC demo — the one adapter family with no trained-weight
# evidence in any round (VERDICT r3 next #2).  Short GAN schedule on the
# synthetic stream, export the generator, 1001-step attack, mean-scale real
# bitstream.  Sequential — ONE TPU process at a time.
set -u
cd /root/repo
mkdir -p logs ckpts/demo

gan=/tmp/hific-q1-gan.msgpack
ck=/tmp/hific-q1-synthetic.msgpack

echo "=== train hific (GAN, 2000 steps, synthetic) ==="
timeout 10800 python -m imagecompression_adversarial_tpu.cli.train_hific \
  -m hific -q 1 -metric mse -max_steps 2000 -ckpt $gan \
  2>&1 | tee logs/r4_train_hific.log | tail -4

echo "=== export hific generator ==="
timeout 1800 python - "$gan" "$ck" <<'EOF' 2>&1 | tail -2
import sys

import flax.serialization
import jax

from imagecompression_adversarial_tpu.models import init_model, init_params
from imagecompression_adversarial_tpu.runtime import save_params

src, dst = sys.argv[1], sys.argv[2]
module = init_model("hific", 1)
params = init_params(module, jax.random.PRNGKey(0))
raw = flax.serialization.msgpack_restore(open(src, "rb").read())
gen = flax.serialization.from_state_dict(params, raw["generator"])
import jax.numpy as jnp
save_params(gen, dst, dtype=jnp.float16)
print(f"exported generator -> {dst}")
EOF

echo "=== attack hific (1001 steps) ==="
timeout 9000 python -m imagecompression_adversarial_tpu.cli.attack_rd \
  -m hific -q 1 -metric mse -ckpt $ck \
  -steps 1001 -s '/tmp/kodak_synth/kodim*.png' \
  2>&1 | tee logs/r4_attack_hific.log | tail -4

echo "=== real codec hific (mean-scale, 384x256) ==="
timeout 5400 python -m imagecompression_adversarial_tpu.cli.codec \
  -m hific -q 1 -metric mse -ckpt $ck \
  -s /tmp/kodak_synth/small01.png -t /tmp/r4_hific_dec.png \
  2>&1 | tee logs/r4_codec_hific.log | tail -5
echo "=== hific demo done ==="
