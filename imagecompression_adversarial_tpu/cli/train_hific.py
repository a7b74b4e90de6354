"""CLI: GAN training for the HiFiC-family codec.

The training side of the reference's HiFiC adapter (`/root/reference/HiFiC/
model.py` loss wiring): alternating generator/discriminator steps with the
HiFiC objective (rate + MSE + perceptual + non-saturating GAN).
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import optax

import flax.serialization

from ..config import Config, apply_precision, build_parser
from ..models import init_model, init_params
from ..models.hific import HiFiCDiscriminator
from ..train.data import make_batches, prefetch
from ..train.gan import make_gan_train_step


def run(cfg, data_root=None, max_steps=None) -> dict:
    apply_precision(cfg)
    codec = init_model("hific", cfg.quality)
    g_params = init_params(codec, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))

    disc = HiFiCDiscriminator()
    dummy_x = jnp.zeros((cfg.batch_size, 256, 256, 3))
    dummy_y = jnp.zeros((cfg.batch_size, 16, 16, 220))
    d_vars = disc.init(jax.random.PRNGKey(1), dummy_x, dummy_y, train=False)
    d_params = d_vars["params"]
    d_stats = d_vars.get("batch_stats", {})

    g_opt = optax.adam(cfg.lr_train)
    d_opt = optax.adam(cfg.lr_train)
    g_opt_state = g_opt.init(g_params)
    d_opt_state = d_opt.init(d_params)
    step_fn = jax.jit(make_gan_train_step(codec, disc, g_opt, d_opt))

    batches = prefetch(make_batches(data_root, cfg.batch_size, crop=256))
    rng = jax.random.PRNGKey(42)
    t0 = time.time()
    logs = {}
    for step, batch_np in enumerate(batches):
        rng, sub = jax.random.split(rng)
        g_params, d_params, d_stats, g_opt_state, d_opt_state, logs = step_fn(
            g_params, d_params, d_stats, g_opt_state, d_opt_state,
            jnp.asarray(batch_np), sub,
        )
        if step % 10 == 0:
            print(
                f"step {step} loss {float(logs['loss']):.4f} "
                f"bpp {float(logs['bpp']):.4f} mse {float(logs['mse']):.5f} "
                f"perc {float(logs['perceptual']):.4f} "
                f"d {float(logs['d_loss']):.4f} t {time.time() - t0:.1f}s"
            )
        if max_steps is not None and step + 1 >= max_steps:
            break

    out = cfg.checkpoint or "./ckpts/hific/hific.msgpack"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "wb") as f:
        f.write(flax.serialization.to_bytes(
            {"generator": g_params, "discriminator": d_params}))
    print(f"saved -> {out}")
    return {k: float(v) for k, v in logs.items()}


def main(argv=None):
    parser = build_parser()
    parser.add_argument("-data", dest="data_root", type=str, default=None)
    parser.add_argument("-max_steps", dest="max_steps", type=int, default=None)
    ns = parser.parse_args(argv)
    cfg = Config(**{f.name: getattr(ns, f.name) for f in dataclasses.fields(Config)})
    run(cfg, data_root=ns.data_root, max_steps=ns.max_steps)


if __name__ == "__main__":
    main()
