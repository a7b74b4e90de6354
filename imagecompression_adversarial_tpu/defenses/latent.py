"""Latent-space defenses: clamp latents to profiled per-channel ranges or to
the predicted Gaussian distribution.

Reference behaviour:
  * ``clamp_value_naive`` (`/root/reference/attack_rd.py:53-73`): clamp each
    latent channel of g_a(x) to [channel_min, channel_max] from a stored
    corpus profile (produced by feature_range, `feature_range.py:24-72`).
  * ``clamp_feature_with_p`` (`attack_rd.py:44-51`): clamp the standardized
    prediction error (y - mean)/scale to +-epsilon (scales floored at 0.11).
  * ``clip_dead_channel`` (`self_ensemble.py:133-154`): clamp channels whose
    activation rank deviates far from the profiled rank order.

Profiles are stored as ``.npz`` with arrays ``channel_max``/``channel_min``
(C,) — see `analysis.feature_range`.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def clamp_value_naive(y: jnp.ndarray, channel_max, channel_min) -> jnp.ndarray:
    """Clamp NHWC latents channelwise to the profiled [min, max] ranges."""
    cmax = jnp.asarray(channel_max).reshape(1, 1, 1, -1)
    cmin = jnp.asarray(channel_min).reshape(1, 1, 1, -1)
    return jnp.clip(y, cmin, cmax)


def clamp_feature_with_p(
    y: jnp.ndarray,
    means: jnp.ndarray,
    scales: jnp.ndarray,
    epsilon: float = 50.0,
) -> jnp.ndarray:
    """Clamp the standardized prediction error to +-epsilon sigmas."""
    scales = jnp.maximum(scales, 0.11)
    err = (y - means) / scales
    err = jnp.clip(err, -epsilon, epsilon)
    return err * scales + means


def load_range_profile(path: str) -> Dict[str, np.ndarray]:
    """Load a feature-range profile saved by `analysis.feature_range`."""
    data = np.load(path)
    return {"channel_max": data["channel_max"], "channel_min": data["channel_min"]}


def anomaly_score(y: jnp.ndarray, channel_max, channel_min) -> jnp.ndarray:
    """Out-of-range mass of a latent tensor vs a profile: the detection
    statistic behind the natural-adversarial search (`search.py:130-148`).
    Returns a scalar >= 0; natural images score ~0."""
    cmax = jnp.asarray(channel_max).reshape(1, 1, 1, -1)
    cmin = jnp.asarray(channel_min).reshape(1, 1, 1, -1)
    over = jnp.maximum(y - cmax, 0.0)
    under = jnp.maximum(cmin - y, 0.0)
    return jnp.sum(over + under) / y.size
