"""Conditional Gaussian entropy model (scale / mean-scale hyperpriors).

Stateless re-implementation of the likelihood math CompressAI's
``GaussianConditional`` provides (reached from the reference through
``net.gaussian_conditional`` — `/root/reference/anchors/model.py:91-106`).

The likelihood of an integer-quantized symbol v under N(mean, scale^2) is the
CDF difference over the unit bin around it::

    P(v) = Phi((v - mean + 1/2) / scale) - Phi((v - mean - 1/2) / scale)

computed via the |v| fold + erfc trick so both CDF evaluations happen on the
numerically safe tail.  Scales are floored at SCALE_BOUND = 0.11 (the same
floor the reference relies on, cf. `attack_rd.py:46`) through the gated
lower-bound STE so rate gradients keep flowing at the floor.

Everything is elementwise -> fuses into neighbouring convs on TPU; no Pallas
needed here.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.bounds import lower_bound, upper_bound
from ..ops.quant import quantize

_LIKELIHOOD_BOUND = 1e-9

#: Default lower bound on predicted scales (CompressAI convention).
SCALE_BOUND = 0.11

#: Default scale table for real range coding: 64 log-spaced points in
#: [0.11, 256].
SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64


def default_scale_table() -> jnp.ndarray:
    return jnp.exp(
        jnp.linspace(
            math.log(SCALES_MIN), math.log(SCALES_MAX), SCALES_LEVELS
        )
    )


def _standardized_cumulative(x: jax.Array) -> jax.Array:
    """Phi(x) via the complementary error function (tail-accurate)."""
    half = jnp.asarray(0.5, x.dtype)
    const = jnp.asarray(-(2.0 ** -0.5), x.dtype)
    return half * jax.lax.erfc(const * x)


def gaussian_likelihood(
    values: jax.Array,
    scales: jax.Array,
    means: Optional[jax.Array] = None,
    scale_bound: float = SCALE_BOUND,
    scale_max: Optional[float] = SCALES_MAX,
) -> jax.Array:
    """Unit-bin likelihood of (already quantized) ``values``.

    Scales are bounded into ``[scale_bound, scale_max]`` — the exact range
    the real coder's 64-entry table covers (``gc_build_indexes`` clamps
    out-of-range predictions to the last table row, like CompressAI's
    ``build_indexes``).  Without the top clamp an under-calibrated scale
    head (e.g. a briefly-trained TIC) reports an ESTIMATED bpp up to 7%
    above what the real coder writes on the wire (RESULTS.md round 3);
    bounding here makes the estimate model the code that actually runs.
    Both bounds use the gradient-gated STE so rate gradients keep flowing
    at the clamp.  ``scale_max=None`` disables the top clamp (pure
    CompressAI ``GaussianConditional.forward`` semantics).
    """
    if means is not None:
        values = values - means
    scales = lower_bound(scales, scale_bound)
    if scale_max is not None:
        scales = upper_bound(scales, scale_max)
    values = jnp.abs(values)
    upper = _standardized_cumulative((0.5 - values) / scales)
    lower = _standardized_cumulative((-0.5 - values) / scales)
    return upper - lower


def gaussian_mixture_likelihood(
    values: jax.Array,
    scales: jax.Array,
    means: jax.Array,
    weight_logits: jax.Array,
    scale_bound: float = SCALE_BOUND,
) -> jax.Array:
    """Unit-bin likelihood under a K-component Gaussian mixture.

    ``scales``/``means``/``weight_logits`` have a trailing component axis
    (..., K) relative to ``values`` (...); weights are softmax-normalized.
    This is the GMM entropy model of Cheng2020 ("attention + GMM" in the
    driver's config list) — the single-Gaussian path stays the anchor's.
    """
    v = values[..., None]
    scales = lower_bound(scales, scale_bound)
    centered = jnp.abs(v - means)
    upper = _standardized_cumulative((0.5 - centered) / scales)
    lower = _standardized_cumulative((-0.5 - centered) / scales)
    comp = upper - lower  # (..., K)
    w = jax.nn.softmax(weight_logits, axis=-1)
    return jnp.sum(w * comp, axis=-1)


def gaussian_mixture_conditional(
    y: jax.Array,
    scales: jax.Array,
    means: jax.Array,
    weight_logits: jax.Array,
    quant_mode: str = "noise",
    key: Optional[jax.Array] = None,
    scale_bound: float = SCALE_BOUND,
) -> Tuple[jax.Array, jax.Array]:
    """Quantize ``y`` (means-free rounding, as the autoregressive families
    do) and evaluate the mixture likelihood on the quantized values."""
    y_hat = quantize(y, quant_mode, means=None, key=key)
    likelihood = gaussian_mixture_likelihood(
        y_hat, scales, means, weight_logits, scale_bound=scale_bound
    )
    likelihood = lower_bound(likelihood, _LIKELIHOOD_BOUND)
    return y_hat, likelihood


def gaussian_conditional(
    y: jax.Array,
    scales: jax.Array,
    means: Optional[jax.Array] = None,
    quant_mode: str = "noise",
    key: Optional[jax.Array] = None,
    scale_bound: float = SCALE_BOUND,
    means_free_round: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Quantize ``y`` and return (y_hat, likelihoods).

    Mirrors ``GaussianConditional.forward``: quantization uses additive noise
    in training mode and mean-centered rounding at inference; the likelihood
    is evaluated on the quantized values.

    ``means_free_round=True`` quantizes WITHOUT the mean offset while still
    evaluating the Gaussian(mean, scale) likelihood at the quantized point —
    the convention of checkerboard/GMM-style coders that write plain
    ``round(y)`` symbols (fic's fast context model; the real coder's
    fractional mean shift lives in the CDF row).  Estimating with
    mean-centered rounding while coding means-free symbols systematically
    underestimates rate (measured −43% on the trained fic demo, round 5)."""
    y_hat = quantize(y, quant_mode, means=None if means_free_round else means,
                     key=key)
    likelihood = gaussian_likelihood(y_hat, scales, means=means, scale_bound=scale_bound)
    likelihood = lower_bound(likelihood, _LIKELIHOOD_BOUND)
    return y_hat, likelihood
