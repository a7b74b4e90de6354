"""Random-noise and blur robustness evaluation.

Re-implements `/root/reference/random_noise.py`:
  * ``noise_robustness``: add Gaussian noise of a target L2 level, report
    the VI-style amplification ``10 log10(err_out / noise_power)``, bpp, and
    reconstruction PSNR (`random_noise.py:68-111`)
  * ``calibrated_blur``: Gaussian 5x5 blur with sigma annealed until the
    input MSE meets the budget (`random_noise.py:50-66`)
  * noise-level x quality sweep driver (`random_noise.py:153-164`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_noise_eval_fn(module):
    """(params, x, key, noise_power) -> {dpsnr_vi, bpp, bpp_ori, psnr}."""

    def eval_fn(params, x, key, noise_power):
        scale = jnp.sqrt(noise_power)
        noise = scale * jax.random.normal(key, x.shape, x.dtype)
        im_in = jnp.clip(x + noise, 0.0, 1.0)

        res_ori = module.apply({"params": params}, x, quant_mode="dequantize")
        res = module.apply({"params": params}, im_in, quant_mode="dequantize")
        x_hat = jnp.clip(res["x_hat"], 0.0, 1.0)
        x_hat_ori = jnp.clip(res_ori["x_hat"], 0.0, 1.0)

        from ..metrics import bpp_from_likelihoods

        num_pixels = x.shape[1] * x.shape[2]
        bpp_ori = bpp_from_likelihoods(res_ori["likelihoods"], num_pixels)
        bpp = bpp_from_likelihoods(res["likelihoods"], num_pixels)

        err_out = jnp.mean((x_hat_ori - x_hat) ** 2)
        noise_pow = jnp.mean(noise ** 2)
        return {
            "vi_noise": 10.0 * jnp.log10(err_out / noise_pow),
            "bpp": bpp,
            "bpp_ori": bpp_ori,
            "psnr": -10.0 * jnp.log10(jnp.mean((x_hat - x) ** 2)),
        }

    return jax.jit(eval_fn)


def _gaussian_blur_kernel(sigma: float, size: int = 5) -> np.ndarray:
    c = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(c ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, sigma: float, size: int = 5) -> jnp.ndarray:
    """Depthwise 5x5 Gaussian blur, reflect-free torch-style zero padding
    semantics are unnecessary here: torchvision GaussianBlur uses reflect
    padding, so we do too."""
    k = _gaussian_blur_kernel(sigma, size)
    c = x.shape[-1]
    kern = jnp.tile(jnp.asarray(k).reshape(size, size, 1, 1), (1, 1, 1, c))
    pad = size // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    dn = jax.lax.conv_dimension_numbers(
        xp.shape, kern.shape, ("NHWC", "HWIO", "NHWC")
    )
    return jax.lax.conv_general_dilated(
        xp, kern, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )


def calibrated_blur(
    x: np.ndarray, target_mse: float, sigma0: float = 5.0, step: float = 0.005
) -> Tuple[np.ndarray, float]:
    """Anneal sigma downward until the blurred image's MSE <= 1.01*target
    (ref `random_noise.py:50-66`)."""
    xj = jnp.asarray(x)
    sigma = sigma0
    im_blur = jnp.clip(gaussian_blur(xj, sigma), 0.0, 1.0)
    while float(jnp.mean((im_blur - xj) ** 2)) > target_mse * 1.01 and sigma > step:
        sigma -= step
        im_blur = jnp.clip(gaussian_blur(xj, sigma), 0.0, 1.0)
    return np.asarray(im_blur), sigma


def make_deblur_eval_fn(module):
    """(params, im_blur, im_sharp) -> {dpsnr, bpp, psnr_out}: how much the
    codec 'repairs' or degrades a blurred input (ref `test_deblur`,
    `random_noise.py:19-48`)."""

    def eval_fn(params, im_blur, im_sharp):
        res = module.apply({"params": params}, im_blur, quant_mode="dequantize")
        y = jnp.clip(res["x_hat"], 0.0, 1.0)
        from ..metrics import bpp_from_likelihoods

        num_pixels = im_blur.shape[1] * im_blur.shape[2]
        bpp = bpp_from_likelihoods(res["likelihoods"], num_pixels)
        psnr_blur = -10.0 * jnp.log10(jnp.mean((im_blur - im_sharp) ** 2))
        psnr_out = -10.0 * jnp.log10(jnp.mean((y - im_sharp) ** 2))
        return {"dpsnr": psnr_blur - psnr_out, "bpp": bpp, "psnr_out": psnr_out}

    return jax.jit(eval_fn)
