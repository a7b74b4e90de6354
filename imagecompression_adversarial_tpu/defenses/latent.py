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


def clip_dead_channel(
    y: jnp.ndarray,
    dead: np.ndarray,
    ranks_min: np.ndarray,
    tolerance: int = 100,
    dead_bound: float = 1.5,
) -> jnp.ndarray:
    """Rank-order latent defense (ref `self_ensemble.py:133-154`).

    Per channel c of the NHWC latent (batch of one, like the reference):
      * profiled-dead channels are clamped to ``[-dead_bound, dead_bound]``
        (ref :147);
      * channels whose current activation rank (by spatial abs-max,
        descending) is more than ``tolerance`` places HIGHER than their
        profiled minimum rank are clamped to the abs-max of channel
        ``ranks_min[c]`` — the reference indexes the current image's
        per-channel abs-max table directly by the profiled rank
        (ref :151) and we reproduce that exactly;
      * all other channels pass through.

    Vectorized: one argsort + two gathers instead of the reference's
    per-channel Python loop.

    Args:
      y: (1, H, W, C) latent.
      dead: boolean mask (C,) of profiled dead channels.
      ranks_min: (C,) minimum profiled rank per channel (int).
    """
    assert y.shape[0] == 1, "clip_dead_channel operates on a single image"
    c = y.shape[-1]
    absmax = jnp.max(jnp.abs(y), axis=(1, 2))[0]  # (C,)
    order = jnp.argsort(-absmax)  # channels in descending abs-max
    rank = jnp.zeros((c,), jnp.int32).at[order].set(
        jnp.arange(c, dtype=jnp.int32)
    )
    ranks_min = jnp.asarray(np.asarray(ranks_min), jnp.int32)
    dead_mask = jnp.asarray(np.asarray(dead), bool)

    cap = absmax[jnp.clip(ranks_min, 0, c - 1)]  # (C,) per-channel clamp amp
    misranked = rank < (ranks_min - tolerance)

    hi = jnp.where(dead_mask, dead_bound,
                   jnp.where(misranked, cap, jnp.inf))
    lo = -hi
    return jnp.clip(y, lo.reshape(1, 1, 1, -1), hi.reshape(1, 1, 1, -1))


def make_latent_defend_fn(module, params, transform) -> "callable":
    """Eval-time latent defense hook: ``x -> (x_hat, likelihoods)``.

    Encodes ``y = g_a(x)``, applies ``transform(y)`` (e.g. a
    :func:`clip_dead_channel` or :func:`clamp_value_naive` closure), then
    re-enters the codec at ``from_latent`` so both the reconstruction and
    the rate come from the clamped latent — the y_main-rewrite pattern the
    reference threads through its eval paths (`attack_ifgsm.py:186-210`)."""

    def defend(x):
        y = module.apply({"params": params}, x, method="g_a")
        y_ = transform(y)
        result = module.apply(
            {"params": params}, y_, "dequantize", method="from_latent"
        )
        return result["x_hat"], result["likelihoods"]

    return defend


def load_range_profile(path: str, require=()) -> Dict[str, np.ndarray]:
    """Load a feature-range profile saved by `analysis.feature_range`.

    ``require`` names keys the caller depends on (e.g. ``('dead',
    'ranks_min')`` for the clip defense); an old range-only profile then
    fails with a re-profile hint instead of a bare KeyError downstream.
    """
    data = np.load(path)
    out = {"channel_max": data["channel_max"], "channel_min": data["channel_min"]}
    for key in ("dead", "ranks_min", "ranks_max"):
        if key in data:
            out[key] = data[key]
    missing = [k for k in require if k not in out]
    if missing:
        raise ValueError(
            f"range profile {path!r} lacks {missing} (old range-only "
            "format?) — re-run `python -m imagecompression_adversarial_tpu."
            "cli.feature_range` to regenerate it with dead/rank statistics"
        )
    return out


def anomaly_score(y: jnp.ndarray, channel_max, channel_min) -> jnp.ndarray:
    """Out-of-range mass of a latent tensor vs a profile: the detection
    statistic behind the natural-adversarial search (`search.py:130-148`).
    Returns a scalar >= 0; natural images score ~0."""
    cmax = jnp.asarray(channel_max).reshape(1, 1, 1, -1)
    cmin = jnp.asarray(channel_min).reshape(1, 1, 1, -1)
    over = jnp.maximum(y - cmax, 0.0)
    under = jnp.maximum(cmin - y, 0.0)
    return jnp.sum(over + under) / y.size
