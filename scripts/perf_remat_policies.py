"""Second-stage attack throughput sweep: jax.checkpoint policies.

perf_attack_variants.py showed plain remat (nothing_saveable) beats the
baseline 189.7 vs 180.9 steps/s; this sweeps the saveable policies to see
whether saving matmul/conv outputs while recomputing the elementwise chain
does better still.
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
    output_s = jnp.clip(
        jax.jit(lambda v: apply_fn(v, "dequantize"))(x)["x_hat"], 0.0, 1.0
    )
    jax.block_until_ready(output_s)

    cfg = RDAttackConfig(steps=steps)
    lrs = jnp.asarray(multistep_lr_schedule(cfg.steps, cfg.lr, cfg.lr_milgamma))
    opt = adam_on_noise()

    def timed(name, run):
        jfn = jax.jit(run)
        out = jfn(jnp.zeros_like(x))
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = jfn(jnp.zeros_like(x))
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:44s} {steps/best:8.1f} steps/s ({best:.2f}s)", flush=True)

    def make(policy=None, remat=True, prevent_cse=True, unroll=1):
        loss = lambda n: _attack_loss(apply_fn, x, output_s, n, cfg)
        if remat:
            loss = jax.checkpoint(loss, policy=policy, prevent_cse=prevent_cse)
        grad_fn = jax.grad(loss, has_aux=True)

        def run(noise0):
            def step(carry, lr):
                noise, opt_state = carry
                grads, _ = grad_fn(noise)
                updates, opt_state = opt.update(grads, opt_state)
                noise = noise + jax.tree_util.tree_map(lambda u: -lr * u, updates)
                return (noise, opt_state), None

            return jax.lax.scan(
                step, (noise0, opt.init(noise0)), lrs, unroll=unroll
            )[0][0]

        return run

    cp = jax.checkpoint_policies
    # In a scan body prevent_cse is unnecessary (JAX docs) — letting XLA
    # CSE the recomputed forward may recover part of the double-fwd cost.
    timed("remat prevent_cse=False", make(prevent_cse=False))
    timed("remat prevent_cse=False unroll=2", make(prevent_cse=False, unroll=2))
    timed("remat nothing_saveable (default)", make())
    timed(
        "remat save_only latents (named)",
        make(policy=cp.save_only_these_names("latent", "latent_hat", "hyper_out")),
    )
    timed("remat dots_saveable", make(policy=cp.dots_saveable))
    timed("remat dots_with_no_batch_dims", make(policy=cp.dots_with_no_batch_dims_saveable))
    timed("no remat (baseline)", make(remat=False))


if __name__ == "__main__":
    main()
