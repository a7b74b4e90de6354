"""Latent-distribution analysis and visualization data.

Re-implements the analysis core of `/root/reference/visual_distribution.py`:
  * predicted symbol distribution from the conditional Gaussian: Normal CDF
    differences on the integer lattice (`predicted_distribution`,
    `visual_distribution.py:85-101`)
  * per-channel rate (bits) of a latent under the model, and the ranking of
    channels by rate inflation between a natural and an adversarial input
    (`visual_distribution.py:156-180`)
  * histogram dumps for plotting.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.gaussian import gaussian_likelihood


def predicted_distribution(
    means: jnp.ndarray, scales: jnp.ndarray, grid: Tuple[int, int] = (-30, 30)
) -> jnp.ndarray:
    """P(v) on the integer lattice for each (mean, scale) element.

    Returns (grid_size, ...) probabilities via CDF differences.
    """
    lo, hi = grid
    vs = jnp.arange(lo, hi + 1, dtype=jnp.float32)
    def pv(v):
        return gaussian_likelihood(jnp.full_like(means, v), scales, means)
    return jax.vmap(pv)(vs)


def channel_rates(likelihoods: jnp.ndarray) -> jnp.ndarray:
    """Per-channel bits from an NHWC likelihood tensor."""
    return jnp.sum(-jnp.log2(likelihoods), axis=(0, 1, 2))


def rate_inflation_ranking(
    lik_natural: jnp.ndarray, lik_adversarial: jnp.ndarray
) -> Dict[str, np.ndarray]:
    """Rank channels by absolute rate increase adversarial vs natural
    (ref `visual_distribution.py:156-180`)."""
    r_nat = np.asarray(channel_rates(lik_natural))
    r_adv = np.asarray(channel_rates(lik_adversarial))
    inflation = r_adv - r_nat
    order = np.argsort(-inflation)
    return {
        "rate_natural": r_nat,
        "rate_adversarial": r_adv,
        "inflation": inflation,
        "ranking": order,
    }


def latent_histogram(
    y_hat: jnp.ndarray, channel: int, bins: int = 61, value_range=(-30.0, 30.0)
) -> Tuple[np.ndarray, np.ndarray]:
    """Empirical histogram of a latent channel (for plotting vs predicted)."""
    vals = np.asarray(y_hat[..., channel]).ravel()
    hist, edges = np.histogram(vals, bins=bins, range=value_range, density=True)
    return hist, edges
