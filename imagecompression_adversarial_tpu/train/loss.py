"""Rate-distortion training loss.

Matches the reference ``RateDistortionLoss`` (`/root/reference/train.py:37-96`):
  * rate: sum of -log2(likelihood) per pixel with the likelihoods floored at
    1/65536 through the gated lower-bound STE
  * distortion branches: ``mse`` -> lambda * 255^2 * MSE + bpp,
    ``ms-ssim`` -> lambda * (1 - msim) + bpp
  * per-quality lambda tables (`train.py:255-258`).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp

from ..metrics import ms_ssim
from ..ops.bounds import lower_bound

_DEFAULT_LPIPS: Optional[Callable] = None


def _default_lpips() -> Callable:
    """Lazily built module-default LPIPS callable (random features — the
    documented sandbox substitute; see `metrics/lpips.py`)."""
    global _DEFAULT_LPIPS
    if _DEFAULT_LPIPS is None:
        from ..metrics.lpips import make_lpips_fn

        _DEFAULT_LPIPS = make_lpips_fn(seed=0)
    return _DEFAULT_LPIPS

_LOG2 = math.log(2.0)
_LIK_FLOOR = 1.0 / 65536.0

# lambda tables, quality 1..8 (ref train.py:255-258)
LAMBDA_MSE = (0.0018, 0.0035, 0.0067, 0.0130, 0.0250, 0.0483, 0.0932, 0.1800)
LAMBDA_MSSSIM = (2.40, 4.58, 8.73, 16.64, 31.73, 60.50, 115.37, 220.00)


def lambda_for(metric: str, quality: int) -> float:
    table = LAMBDA_MSE if metric == "mse" else LAMBDA_MSSSIM
    return table[quality - 1]


def rate_distortion_loss(
    result: Dict[str, Any],
    target,
    lmbda: float,
    metric: str = "mse",
    perceptual_fn: Optional[Callable] = None,
) -> Dict[str, jnp.ndarray]:
    """Compute {loss, bpp_loss, distortion} for a codec forward result."""
    n, h, w, _ = target.shape
    num_pixels = n * h * w

    bpp = jnp.asarray(0.0, jnp.float32)
    for lik in result["likelihoods"].values():
        bpp = bpp + jnp.sum(jnp.log(lower_bound(lik, _LIK_FLOOR)))
    bpp = bpp / (-_LOG2 * num_pixels)

    x_hat = result["x_hat"]
    if metric == "mse":
        distortion = jnp.mean((x_hat - target) ** 2)
        loss = lmbda * (255.0 ** 2) * distortion + bpp
    elif metric == "ms-ssim":
        distortion = 1.0 - ms_ssim(x_hat, target)
        loss = lmbda * distortion + bpp
    elif metric == "lpips":
        # ref `train.py:92-94`: loss = lmbda * mean(lpips(x_hat, x)) + bpp.
        # perceptual_fn defaults to the in-framework LPIPS head with random
        # AlexNet-shaped features (metrics/lpips.py); converted real LPIPS
        # weights plug in via the argument.
        fn = perceptual_fn if perceptual_fn is not None else _default_lpips()
        distortion = fn(x_hat, target)
        loss = lmbda * distortion + bpp
    else:
        raise ValueError(
            f"metric {metric!r} not in ('mse', 'ms-ssim', 'lpips')"
        )
    return {"loss": loss, "bpp_loss": bpp, "distortion": distortion}


def recompression_loss(g_a_fn, im0, im1, lamb2: float = 0.01) -> jnp.ndarray:
    """Latent-stability regularizer used by recompression-regularized training
    (ref `train.py:25-35`): L2 distance between the latents of the original
    and the reconstruction, scaled by an internal 0.01."""
    f0 = g_a_fn(im0)
    f1 = g_a_fn(im1)
    return jnp.sqrt(jnp.sum((f0 - f1) ** 2)) * lamb2
