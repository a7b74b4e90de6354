"""Attack-step throughput experiments (VERDICT round-1 weak #2: explain or
close the 3x fwd-vs-fwd+bwd gap).

Measures, on the real chip, steps/sec of the canonical attack scan (hyper
q=1, 768x512, 1001 steps) under: scan unroll factors, jax.checkpoint
(remat) of the loss, and carry donation — plus the fwd-only and bare
fwd+bwd scan floors for reference.  One process, sequential variants.

Usage: python scripts/perf_attack_variants.py [--steps 1001]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from imagecompression_adversarial_tpu.attacks import RDAttackConfig
from imagecompression_adversarial_tpu.attacks.common import (
    adam_on_noise,
    multistep_lr_schedule,
)
from imagecompression_adversarial_tpu.attacks.rd import _attack_loss
from imagecompression_adversarial_tpu.models import init_model, init_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1001)
    args = ap.parse_args()
    steps = args.steps

    jax.config.update("jax_default_matmul_precision", "default")
    module = init_model("hyper", 1)
    params = init_params(module, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 512, 768, 3), jnp.float32)

    apply_fn = lambda im, quant_mode: module.apply(
        {"params": params}, im, quant_mode=quant_mode
    )
    result_s = jax.jit(lambda v: apply_fn(v, "dequantize"))(x)
    output_s = jnp.clip(result_s["x_hat"], 0.0, 1.0)
    jax.block_until_ready(output_s)

    cfg = RDAttackConfig(steps=steps)
    lrs = jnp.asarray(multistep_lr_schedule(cfg.steps, cfg.lr, cfg.lr_milgamma))
    opt = adam_on_noise()

    def timed(name, fn, *fargs):
        jfn = jax.jit(fn)
        out = jfn(*fargs)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = jfn(*fargs)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:34s} {steps/best:8.1f} steps/s   ({best:.2f}s)", flush=True)
        return steps / best

    # --- floors -----------------------------------------------------------
    def fwd_only_scan(noise0):
        def step(n, lr):
            out = apply_fn(x + n, quant_mode="none")["x_hat"]
            return n + 1e-6 * lr * jnp.mean(out), None
        return jax.lax.scan(step, noise0, lrs)[0]

    def fwd_bwd_scan(noise0):
        g = jax.grad(
            lambda n: jnp.mean(
                (apply_fn(x + n, quant_mode="none")["x_hat"] - output_s) ** 2
            )
        )
        def step(n, lr):
            return n - lr * g(n), None
        return jax.lax.scan(step, noise0, lrs)[0]

    # --- attack variants ---------------------------------------------------
    def make_attack(unroll=1, remat=False):
        loss = lambda n: _attack_loss(apply_fn, x, output_s, n, cfg)
        if remat:
            loss = jax.checkpoint(loss)
        grad_fn = jax.grad(loss, has_aux=True)

        def run(noise0):
            def step(carry, lr):
                noise, opt_state = carry
                grads, aux = grad_fn(noise)
                updates, opt_state = opt.update(grads, opt_state)
                noise = noise + jax.tree_util.tree_map(lambda u: -lr * u, updates)
                return (noise, opt_state), None

            (noise, _), _ = jax.lax.scan(
                step, (noise0, opt.init(noise0)), lrs, unroll=unroll
            )
            return noise

        return run

    noise0 = jnp.zeros_like(x)
    timed("fwd-only scan", fwd_only_scan, noise0)
    timed("bare fwd+bwd scan", fwd_bwd_scan, noise0)
    base = timed("attack (baseline)", make_attack(), noise0)
    timed("attack unroll=2", make_attack(unroll=2), noise0)
    timed("attack unroll=4", make_attack(unroll=4), noise0)
    timed("attack remat", make_attack(remat=True), noise0)
    timed("attack remat+unroll=2", make_attack(unroll=2, remat=True), noise0)
    print(f"baseline for reference: {base:.1f} steps/s", flush=True)


if __name__ == "__main__":
    main()
