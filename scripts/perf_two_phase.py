"""A/B the two-phase loss lowering on the real chip: lax.cond vs scalar
select (RDAttackConfig.two_phase_impl).

The round-5 trace of the 1001-step attack at the phase config shows 48
copy ops per step (1.26 ms/step busy) and 2 conds per step; this measures
whether the cond plumbing is what stands between the measured ~210 steps/s
and the ~242 autodiff ideal (RESULTS.md round 2 floor analysis).

Usage: python scripts/perf_two_phase.py [--steps 1001]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from imagecompression_adversarial_tpu.attacks import RDAttackConfig, make_attack_fn
from imagecompression_adversarial_tpu.config import Config, _setup_compile_cache
from imagecompression_adversarial_tpu.models import init_model, init_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1001)
    args = ap.parse_args()

    jax.config.update("jax_default_matmul_precision", "default")
    _setup_compile_cache(Config().compile_cache)

    module = init_model("hyper", 1)
    params = init_params(module, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 512, 768, 3), jnp.float32)

    base = RDAttackConfig(steps=args.steps)
    for impl in ("cond", "select"):
        cfg = dataclasses.replace(base, two_phase_impl=impl)
        attack = make_attack_fn(module, cfg)
        res = attack(params, x)
        jax.block_until_ready(res["vi"])  # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            res = attack(params, x)
            jax.block_until_ready(res["vi"])
            best = min(best, time.perf_counter() - t0)
        print(
            f"two_phase_impl={impl:6s} {args.steps/best:8.1f} steps/s "
            f"({best:.2f}s)  vi={float(res['vi']):.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
