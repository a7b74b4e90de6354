"""GAN training losses and step for the HiFiC-family codec.

Reference: the HiFiC model's loss wiring (`/root/reference/HiFiC/model.py`,
ported TF1 code): generator total = rate + k_M * 255^2 * MSE + k_P *
perceptual + beta * g_loss with non-saturating GAN losses.  The perceptual
term defaults to (1 - MS-SSIM); pass `metrics.lpips.make_lpips_fn()` (or a
converted-real-weights variant via `lpips_fn_from_params`) as
``perceptual_fn`` for the LPIPS term the reference HiFiC uses.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..metrics import ms_ssim
from .loss import rate_distortion_loss


def non_saturating_g_loss(fake_logits) -> jnp.ndarray:
    return jnp.mean(optax.sigmoid_binary_cross_entropy(
        fake_logits, jnp.ones_like(fake_logits)))


def non_saturating_d_loss(real_logits, fake_logits) -> jnp.ndarray:
    real = optax.sigmoid_binary_cross_entropy(
        real_logits, jnp.ones_like(real_logits))
    fake = optax.sigmoid_binary_cross_entropy(
        fake_logits, jnp.zeros_like(fake_logits))
    return jnp.mean(real) + jnp.mean(fake)


def hific_generator_loss(
    result,
    target,
    fake_logits,
    lmbda_rate: float = 0.14,
    k_m: float = 0.075 * 2 ** -5,
    k_p: float = 1.0,
    beta: float = 0.15,
    perceptual_fn: Optional[Callable] = None,
) -> Tuple[jnp.ndarray, dict]:
    """HiFiC generator objective; ``perceptual_fn(a, b)`` defaults to
    1 - MS-SSIM."""
    rd = rate_distortion_loss(result, target, lmbda=0.0, metric="mse")
    bpp = rd["bpp_loss"]
    mse = jnp.mean((result["x_hat"] - target) ** 2)
    if perceptual_fn is None:
        perceptual = 1.0 - ms_ssim(jnp.clip(result["x_hat"], 0, 1), target)
    else:
        perceptual = perceptual_fn(result["x_hat"], target)
    g_adv = non_saturating_g_loss(fake_logits)
    total = lmbda_rate * bpp + k_m * (255.0 ** 2) * mse + k_p * perceptual + beta * g_adv
    return total, {
        "bpp": bpp, "mse": mse, "perceptual": perceptual, "g_adv": g_adv,
        "loss": total,
    }


def make_gan_train_step(codec, disc, g_opt, d_opt):
    """One alternating GAN step: (g_params, d_params, g_state, d_state,
    batch, rng) -> updated + logs.  SpectralNorm stats live in the disc's
    'batch_stats' collection and are threaded through."""

    def step(g_params, d_params, d_stats, g_opt_state, d_opt_state, batch, rng):
        rngs = {"quant": rng}

        def g_loss_fn(gp):
            result = codec.apply({"params": gp}, batch, quant_mode="noise",
                                 rngs=rngs)
            fake_logits, _ = disc.apply(
                {"params": d_params, "batch_stats": d_stats},
                jnp.clip(result["x_hat"], 0, 1), result["y_hat"],
                train=True, mutable=["batch_stats"],
            )
            loss, logs = hific_generator_loss(result, batch, fake_logits)
            return loss, (logs, result)

        (g_loss, (g_logs, result)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_params)
        g_updates, g_opt_state = g_opt.update(g_grads, g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, g_updates)

        def d_loss_fn(dp):
            real_logits, vs1 = disc.apply(
                {"params": dp, "batch_stats": d_stats}, batch,
                jax.lax.stop_gradient(result["y_hat"]), train=True,
                mutable=["batch_stats"],
            )
            fake_logits, vs2 = disc.apply(
                {"params": dp, "batch_stats": vs1["batch_stats"]},
                jax.lax.stop_gradient(jnp.clip(result["x_hat"], 0, 1)),
                jax.lax.stop_gradient(result["y_hat"]), train=True,
                mutable=["batch_stats"],
            )
            return non_saturating_d_loss(real_logits, fake_logits), vs2[
                "batch_stats"
            ]

        (d_loss, new_stats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_params)
        d_updates, d_opt_state = d_opt.update(d_grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, d_updates)

        logs = dict(g_logs)
        logs["d_loss"] = d_loss
        return g_params, d_params, new_stats, g_opt_state, d_opt_state, logs

    return step
