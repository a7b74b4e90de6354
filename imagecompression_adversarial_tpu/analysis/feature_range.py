"""Latent activation-range profiling (the defense side's corpus statistics).

Re-implements `/root/reference/feature_range.py:24-72`: per-image channel
max/min of g_a(x) over a corpus; the profile boundary per channel is the
k-th largest max (k = 100, clipped to corpus size) and k-th smallest min.
Profiles feed the latent clamp defenses (`attack_rd.py:53-73`) and the
natural-adversarial detector (`search.py:130-148`).

Stored as ``.npz`` with ``channel_max``/``channel_min`` plus the per-image
stats for downstream analysis.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np


def profile_latents(
    g_a_fn: Callable[[jnp.ndarray], jnp.ndarray],
    images: Iterable[np.ndarray],
    k: int = 100,
) -> dict:
    """Profile per-channel latent ranges over an image iterable."""
    stats_fn = jax.jit(
        lambda x: (
            jnp.max(g_a_fn(x), axis=(0, 1, 2)),
            jnp.min(g_a_fn(x), axis=(0, 1, 2)),
            jnp.max(jnp.abs(g_a_fn(x)), axis=(0, 1, 2)),
        )
    )
    maxs, mins, absmaxs = [], [], []
    for im in images:
        mx, mn, am = stats_fn(jnp.asarray(im))
        maxs.append(np.asarray(mx))
        mins.append(np.asarray(mn))
        absmaxs.append(np.asarray(am))
    maxs = np.stack(maxs)  # (N, C)
    mins = np.stack(mins)
    absmaxs = np.stack(absmaxs)

    kk = min(k, maxs.shape[0])
    # k-th largest max / k-th smallest min per channel (ref :65-66)
    channel_max = np.sort(maxs, axis=0)[-kk, :]
    channel_min = np.sort(mins, axis=0)[kk - 1, :]

    # Rank statistics for clip_dead_channel (ref commented analysis
    # `feature_range.py:83-98` + consumer `self_ensemble.py:133-154`):
    # per image, rank channels by spatial abs-max descending; store each
    # channel's best/worst rank over the corpus.
    order = np.argsort(-absmaxs, axis=1)  # (N, C)
    ranks = np.empty_like(order)
    np.put_along_axis(ranks, order, np.arange(order.shape[1])[None, :], axis=1)
    ranks_max = ranks.max(axis=0)
    ranks_min = ranks.min(axis=0)

    # dead channels: activations never leave [-thres, thres] over the corpus
    # (ref `feature_range.py:74-81`, thres = 2.0)
    dead = (maxs.max(axis=0) < 2.0) & (mins.min(axis=0) > -2.0)

    return {
        "channel_max": channel_max,
        "channel_min": channel_min,
        "per_image_max": maxs,
        "per_image_min": mins,
        "per_image_absmax": absmaxs,
        "ranks_max": ranks_max,
        "ranks_min": ranks_min,
        "dead": dead,
    }


def profile_path(model: str, metric: str, quality: int, adv: bool = False,
                 root: str = "./attack/data") -> str:
    """Reference profile naming scheme (`feature_range.py:69-72`)."""
    name = f"{model}-{metric}-{quality}" + ("-adv" if adv else "")
    return os.path.join(root, f"{name}_range.npz")


def save_profile(profile: dict, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **profile)


def dead_channels(profile: dict, threshold: float = 2.0) -> np.ndarray:
    """Channels whose activations never leave [-threshold, threshold]
    (ref commented analysis `feature_range.py:74-78` /
    `self_ensemble.py:133-154` consumers)."""
    mx = profile["per_image_max"].max(axis=0)
    mn = profile["per_image_min"].min(axis=0)
    return np.where((mx < threshold) & (mn > -threshold))[0]
