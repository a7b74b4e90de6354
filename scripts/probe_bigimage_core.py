"""Probe: run the attack-core and eval programs of the split 12.6 MP
attack separately, reporting which one exhausts HBM and their timings.

Usage: python scripts/probe_bigimage_core.py [H W [steps]] [--skip-eval]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    h = int(args[0]) if args else 4096
    w = int(args[1]) if len(args) > 1 else 3072
    steps = int(args[2]) if len(args) > 2 else 51
    skip_eval = "--skip-eval" in sys.argv

    jax.config.update("jax_default_matmul_precision", "default")
    from imagecompression_adversarial_tpu.attacks import (
        RDAttackConfig,
        make_attack_fn,
    )
    from imagecompression_adversarial_tpu.config import Config, _setup_compile_cache
    from imagecompression_adversarial_tpu.models import init_model, init_params

    _setup_compile_cache(Config().compile_cache)  # megapixel compiles are minutes
    cfg = RDAttackConfig(steps=steps, phase_space_loss=True, split_eval=True)
    module = init_model("hyper", 1)
    params = init_params(module, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, 3), jnp.float32)
    attack = make_attack_fn(module, cfg)

    t0 = time.perf_counter()
    im_in, bpp_ori, li, lo = attack.core_jit(params, x, None)
    jax.block_until_ready(im_in)
    t1 = time.perf_counter()
    print(f"CORE OK: {steps} steps, first call {t1 - t0:.1f}s "
          f"bpp_ori={float(bpp_ori):.4f}", flush=True)
    t0 = time.perf_counter()
    im_in, *_ = attack.core_jit(params, x, None)
    jax.block_until_ready(im_in)
    dt = time.perf_counter() - t0
    mp = h * w / 1e6
    print(f"CORE steady: {steps} steps in {dt:.2f}s ({steps/dt:.1f} steps/s, "
          f"{steps/dt*mp:.0f} MP*steps/s)", flush=True)

    if skip_eval:
        return
    # drop the probe's own full-res device buffers before the full attack:
    # at 12.6 MP every live 151 MB output narrows the eval program's HBM
    # headroom (round-3 same-process caveat, RESULTS.md)
    del im_in
    # full attack() = core + the piecewise per-metric eval programs
    t0 = time.perf_counter()
    ev = attack(params, x)
    jax.block_until_ready(ev["vi"])
    t1 = time.perf_counter()
    print(f"FULL OK in {t1 - t0:.1f}s vi={float(ev['vi']):.3f} "
          f"mse_in={float(ev['mse_in']):.2e} mse_out={float(ev['mse_out']):.2e}",
          flush=True)


if __name__ == "__main__":
    main()
