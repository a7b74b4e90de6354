"""VERDICT r3 next #6 done-criterion: TWO consecutive full 12.6 MP attacks
(core scan + piecewise eval) in ONE process, exercising the same-process
residue path that round 3 could only drive from a fresh process.

Usage: python scripts/r4_bigimage_twice.py [H W [steps]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main():
    args = sys.argv[1:]
    h = int(args[0]) if args else 4096
    w = int(args[1]) if len(args) > 1 else 3072
    steps = int(args[2]) if len(args) > 2 else 101

    jax.config.update("jax_default_matmul_precision", "default")
    from imagecompression_adversarial_tpu.attacks import (
        RDAttackConfig,
        make_attack_fn,
    )
    from imagecompression_adversarial_tpu.config import Config, _setup_compile_cache
    from imagecompression_adversarial_tpu.models import init_model, init_params

    _setup_compile_cache(Config().compile_cache)  # 12.6MP compile is ~32 min
    cfg = RDAttackConfig(steps=steps, phase_space_loss=True, split_eval=True)
    module = init_model("hyper", 1)
    params = init_params(module, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    attack = make_attack_fn(module, cfg)

    for run in (1, 2):
        # distinct image content per run (same shape: executables cached)
        x = jax.random.uniform(jax.random.PRNGKey(run), (1, h, w, 3), jnp.float32)
        t0 = time.perf_counter()
        ev = attack(params, x)
        jax.block_until_ready(ev["vi"])
        dt = time.perf_counter() - t0
        print(
            f"FULL RUN {run} OK: {h}x{w} {steps} steps in {dt:.1f}s "
            f"vi={float(ev['vi']):.3f} bpp={float(ev['bpp']):.4f}",
            flush=True,
        )
        del ev, x
    print("TWO CONSECUTIVE FULL ATTACKS IN ONE PROCESS: OK", flush=True)


if __name__ == "__main__":
    main()
