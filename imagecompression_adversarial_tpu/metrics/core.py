"""Scalar quality / rate metrics.

Definitions match the reference exactly:
  PSNR              `/root/reference/utils/metrics.py:7-11`
  bpp (estimate)    `/root/reference/attack_rd.py:303,419`
  VI, vi_msim       `/root/reference/self_ensemble.py:239-242`
  YUV (BT.601)      `/root/reference/utils/metrics.py:13-50`
"""

from __future__ import annotations

import math
from typing import Dict, Iterable

import jax
import jax.numpy as jnp

_LOG2 = math.log(2.0)


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean((a - b) ** 2)


def psnr(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Peak signal-to-noise ratio in dB."""
    m = mse(a, b)
    return 10.0 * jnp.log10((max_val ** 2) / m)


def bpp_from_likelihoods(
    likelihoods: Iterable[jax.Array] | Dict[str, jax.Array], num_pixels: int
) -> jax.Array:
    """Entropy-estimated bits-per-pixel: sum(-log2 p) / num_pixels."""
    if isinstance(likelihoods, dict):
        likelihoods = likelihoods.values()
    total = 0.0
    for lik in likelihoods:
        total = total + jnp.sum(jnp.log(lik))
    return total / (-_LOG2 * num_pixels)


def vi(mse_in: jax.Array, mse_out: jax.Array) -> jax.Array:
    """The paper's headline attack metric: 10*log10(mse_out / mse_in).

    The reference only reports VI when both MSEs exceed 1e-20 and returns
    None otherwise (`/root/reference/self_ensemble.py:238-243`).  ``None``
    is not jit-representable, so we floor both terms at 1e-20 instead —
    a no-op attack (mse_in == mse_out == 0) yields a finite 0.0 dB rather
    than NaN/inf.
    """
    return 10.0 * jnp.log10(
        jnp.maximum(mse_out, 1e-20) / jnp.maximum(mse_in, 1e-20)
    )


def vi_msim(msim_in: jax.Array, msim_out: jax.Array) -> jax.Array:
    """MS-SSIM analog of VI: 10*log10((1 - msim_out) / (1 - msim_in)).

    The reference skips this metric when msim_in >= 0.9999
    (`/root/reference/self_ensemble.py:240-242`); flooring both
    complements at 1e-4 (== 1 - 0.9999) keeps it finite under jit for
    identical inputs instead.
    """
    return 10.0 * jnp.log10(
        jnp.maximum(1.0 - msim_out, 1e-4) / jnp.maximum(1.0 - msim_in, 1e-4)
    )


# BT.601 full-range RGB <-> YUV (reference torch_rgb2yuv444).
# numpy on purpose: module-level jnp constants would initialize the device
# backend at import time.
import numpy as _np

_RGB2YUV = _np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.169, -0.331, 0.499],
        [0.499, -0.418, -0.0813],
    ],
    _np.float32,
)
_YUV_OFFSET = _np.array([0.0, 128.0 / 255.0, 128.0 / 255.0], _np.float32)


def rgb2yuv444(x: jax.Array) -> jax.Array:
    """NHWC RGB in [0,1] -> YUV444 (BT.601, chroma offset +0.5)."""
    return jnp.einsum("...c,oc->...o", x, _RGB2YUV.astype(x.dtype)) + _YUV_OFFSET.astype(
        x.dtype
    )


def mse_yuv444(a: jax.Array, b: jax.Array, weights=(6.0, 1.0, 1.0)) -> jax.Array:
    """6:1:1-weighted YUV MSE (reference YUV_MSELoss)."""
    ya, yb = rgb2yuv444(a), rgb2yuv444(b)
    w = jnp.asarray(weights, a.dtype)
    w = w / jnp.sum(w)
    per_ch = jnp.mean((ya - yb) ** 2, axis=tuple(range(a.ndim - 1)))
    return jnp.sum(per_ch * w)
