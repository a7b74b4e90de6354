"""Latent quantization modes, threaded explicitly instead of train()/eval().

The reference switches quantization behaviour implicitly through PyTorch
module mode (`net.train()` -> additive uniform noise, `net.eval()` -> round;
see `/root/reference/anchors/model.py:102`, `anchors/balle.py:48`).  Here the
mode is an explicit static argument so a single traced program covers every
use: the attack's quantization-free path is simply ``mode='none'``
(ref `attack_rd.py:344-349`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .bounds import ste_round, universal_quant

#: Valid quantization modes.
QUANT_MODES = ("noise", "dequantize", "ste", "none", "universal")


def quantize(
    y: jax.Array,
    mode: str,
    means: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Quantize a latent tensor.

    Args:
      y: latent values.
      mode: one of
        ``'noise'``      — additive uniform(-.5, .5) noise (training surrogate).
        ``'dequantize'`` — ``round(y - means) + means`` (inference).
        ``'ste'``        — straight-through round (identity gradient).
        ``'none'``       — pass-through (the attack's quantization-free path).
        ``'universal'``  — universal quantization: shared-dither round with
                            identity gradient (ref `utils/ops.py:17-25`).
      means: optional per-element means (conditional-Gaussian offset).
      key: PRNG key, required for ``'noise'``.
    """
    if mode not in QUANT_MODES:
        raise ValueError(f"quant mode {mode!r} not in {QUANT_MODES}")
    if mode == "none":
        return y
    if mode == "noise":
        if key is None:
            raise ValueError("quantize(mode='noise') requires a PRNG key")
        half = jnp.asarray(0.5, y.dtype)
        noise = jax.random.uniform(key, y.shape, y.dtype, minval=-half, maxval=half)
        return y + noise
    if mode == "universal":
        if key is None:
            raise ValueError("quantize(mode='universal') requires a PRNG key")
        if means is not None:
            return universal_quant(y - means, key) + means
        return universal_quant(y, key)
    # round-based modes
    if means is not None:
        centered = y - means
    else:
        centered = y
    if mode == "ste":
        rounded = ste_round(centered)
    else:  # 'dequantize'
        rounded = jnp.round(centered)
    if means is not None:
        rounded = rounded + means
    return rounded
