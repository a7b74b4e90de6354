"""Natural-adversarial-example search over a corpus.

Re-implements `/root/reference/search.py:130-201`: score each image's latent
against a profiled per-channel activation range; images whose channel
maxima exceed the profile by the largest normalized margin are flagged as
natural adversarial examples.
"""

from __future__ import annotations

from typing import Callable, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_detect_fn(g_a_fn: Callable, channel_max, channel_min):
    """x -> anomaly score: max normalized overshoot above channel_max plus
    max normalized undershoot below channel_min (ref `search.py:140-146`)."""
    cmax = jnp.asarray(channel_max).reshape(1, 1, 1, -1)
    cmin = jnp.asarray(channel_min).reshape(1, 1, 1, -1)

    def detect(x):
        y = g_a_fn(x)
        idx_max = jnp.max(y, axis=(1, 2), keepdims=True)
        idx_min = jnp.min(y, axis=(1, 2), keepdims=True)
        err_max = jnp.maximum(idx_max - cmax, 0.0)
        err_min = jnp.minimum(idx_min - cmin, 0.0)
        return jnp.max(err_max / (cmax + 1.0)) + jnp.max(
            jnp.abs(err_min / (cmin + 1.0))
        )

    return jax.jit(detect)


def search_corpus(
    detect_fn: Callable,
    images: Iterable[Tuple[str, np.ndarray]],
) -> List[Tuple[str, float]]:
    """Score (name, image) pairs; return findings sorted by descending score
    (the reference prints every new best, `search.py:161-163`)."""
    scores = []
    for name, im in images:
        scores.append((name, float(detect_fn(jnp.asarray(im)))))
    return sorted(scores, key=lambda kv: -kv[1])
