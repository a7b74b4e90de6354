"""Megapixel attack capability check: can one v5e chip run the RD attack
on large images with full remat (the memory-saving shipping config)?

Usage: python scripts/perf_bigimage.py [H W [steps]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1536
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 51

    jax.config.update("jax_default_matmul_precision", "default")
    from imagecompression_adversarial_tpu.attacks import RDAttackConfig, make_attack_fn
    from imagecompression_adversarial_tpu.models import init_model, init_params

    phase = os.environ.get("ICAT_PHASE_LOSS", "") == "1"
    split = os.environ.get("ICAT_SPLIT_EVAL", "") == "1"
    module = init_model("hyper", 1)
    params = init_params(module, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, 3), jnp.float32)
    attack = make_attack_fn(
        module,
        RDAttackConfig(steps=steps, phase_space_loss=phase, split_eval=split),
    )
    if phase or split:
        print(f"phase_space_loss={phase} split_eval={split}")
    res = attack(params, x)
    jax.block_until_ready(res["vi"])
    t0 = time.perf_counter()
    res = attack(params, x)
    jax.block_until_ready(res["vi"])
    dt = time.perf_counter() - t0
    mp = h * w / 1e6
    print(f"{h}x{w} ({mp:.1f} MP): {steps} steps in {dt:.2f}s "
          f"({steps/dt:.1f} steps/s, {steps/dt*mp:.0f} MP*steps/s) "
          f"vi={float(res['vi']):.3f}", flush=True)


if __name__ == "__main__":
    main()
