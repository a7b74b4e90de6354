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
    ap.add_argument("--device", type=str, default=None,
                    help="'cpu' pins the host backend (the sandbox "
                         "site-hook overrides JAX_PLATFORMS, so the env "
                         "var alone does NOT work — CLAUDE.md)")
    args = ap.parse_args()
    if args.device:
        jax.config.update("jax_platforms", args.device)

    jax.config.update("jax_default_matmul_precision", "default")
    _setup_compile_cache(Config().compile_cache)

    module = init_model("hyper", 1)
    params = init_params(module, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 512, 768, 3), jnp.float32)

    def timed(name, fn, *fargs):
        out = fn(*fargs)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*fargs)
            jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(
            f"{name:28s} {args.steps/best:8.1f} steps/s  best {best:.3f}s "
            f"runs {['%.3f' % t for t in times]}",
            flush=True,
        )
        return out

    base = RDAttackConfig(steps=args.steps)
    for impl in ("cond", "select"):
        cfg = dataclasses.replace(base, two_phase_impl=impl)
        attack = make_attack_fn(module, cfg)
        res = timed(f"attack two_phase={impl}", attack, params, x)
        print(f"   vi={float(res['vi']):.4f}")

    # attack without remat: if XLA CSEs the remat recompute anyway, these
    # should time the same — the 560-steps/s adjudication datum
    attack_nr = make_attack_fn(module, dataclasses.replace(base, remat=False))
    timed("attack remat=False", attack_nr, params, x)

    # full-codec forward scan (what bench.py's sanity floor measures:
    # g_a + h_a + h_s + g_s + likelihoods)
    def full_fwd(noise0):
        def step(n, _):
            out = module.apply({"params": params}, x + n, quant_mode="none")[
                "x_hat"
            ]
            return n + 1e-6 * jnp.mean(out), None

        return jax.lax.scan(step, noise0, None, length=args.steps)[0]

    # the attack's ACTUAL in-loop forward: g_a + phase-space synthesis only
    # (no hyper path, no likelihoods) — the honest fwd floor for the attack,
    # shared with bench.py's sanity cross-check
    from imagecompression_adversarial_tpu.attacks.common import (
        make_phase_fwd_scan,
    )

    z0 = jnp.zeros_like(x)
    timed("full-codec fwd scan", jax.jit(full_fwd), z0)
    phase_jit = jax.jit(make_phase_fwd_scan(module, args.steps))
    timed("phase fwd scan (g_a+g_s_ph)", phase_jit, params, x)


if __name__ == "__main__":
    main()
