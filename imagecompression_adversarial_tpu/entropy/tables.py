"""Quantized CDF table construction for the rANS coder.

Derives, from trained entropy-model parameters, the integer CDF rows the
native coder consumes — the derived state CompressAI persists as
``_quantized_cdf``/``_offset``/``_cdf_length`` buffers (which the reference
has to resize around on checkpoint load, `/root/reference/anchors/utils.py:
46-109`; we regenerate instead of loading).

  * ``pmf_to_quantized_cdf``: 16-bit quantization with a guaranteed nonzero
    escape slot (largest-freq stealing keeps the total at 2^16)
  * ``build_eb_tables``: per-channel pmf of the factorized model sampled on
    the integer lattice spanned by the learned quantiles
  * ``build_gc_tables``: per-scale pmf of the conditional Gaussian over the
    64-entry log-spaced scale table; ``gc_build_indexes`` maps predicted
    scales to rows.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
from scipy import stats

from .factorized import eb_likelihood, eb_logits_cumulative
from .gaussian import SCALE_BOUND, default_scale_table

PRECISION = 16
_SCALE = 1 << PRECISION


def pmf_to_quantized_cdf(pmf: np.ndarray, tail_mass: float) -> np.ndarray:
    """Quantize [pmf..., tail_mass] to an integer CDF summing to 2^16.

    Every slot (including the escape) keeps frequency >= 1; the excess /
    deficit is absorbed by the largest entries.
    """
    probs = np.concatenate([np.asarray(pmf, np.float64), [max(tail_mass, 0.0)]])
    probs = np.maximum(probs, 0.0)
    total = probs.sum()
    if total <= 0:
        probs = np.ones_like(probs)
        total = probs.sum()
    freqs = np.round(probs / total * _SCALE).astype(np.int64)
    freqs = np.maximum(freqs, 1)
    diff = _SCALE - freqs.sum()
    while diff != 0:
        if diff > 0:
            freqs[np.argmax(freqs)] += diff
            diff = 0
        else:
            # steal from the largest entry, keeping it >= 1
            i = int(np.argmax(freqs))
            take = min(-diff, freqs[i] - 1)
            freqs[i] -= take
            diff += take
            if take == 0:
                raise ValueError("cannot normalize pmf to 2^16")
    cdf = np.zeros(len(freqs) + 1, np.uint32)
    cdf[1:] = np.cumsum(freqs)
    return cdf


def pmf_to_quantized_cdf_batch(pmfs: np.ndarray, tails: np.ndarray) -> np.ndarray:
    """Vectorized :func:`pmf_to_quantized_cdf` over R rows.

    pmfs: (R, S) nonnegative; tails: (R,).  Returns (R, S + 2) uint32 CDF
    rows (S regular symbols + escape slot + terminal 2^16).  Needed for the
    GMM real coder, which builds ~1e5 per-pixel rows per image — the scalar
    loop version would dominate the coding time.
    """
    pmfs = np.asarray(pmfs, np.float64)
    r, s = pmfs.shape
    probs = np.concatenate(
        [np.maximum(pmfs, 0.0), np.maximum(tails, 0.0).reshape(r, 1)], axis=1
    )
    total = probs.sum(axis=1, keepdims=True)
    bad = total[:, 0] <= 0
    if bad.any():
        probs[bad] = 1.0
        total = probs.sum(axis=1, keepdims=True)
    freqs = np.round(probs / total * _SCALE).astype(np.int64)
    freqs = np.maximum(freqs, 1)
    diff = _SCALE - freqs.sum(axis=1)  # (R,)
    # absorb the rounding excess/deficit in each row's largest entry;
    # iterate for the rare rows whose largest entry can't absorb it all
    for _ in range(s + 2):
        todo = diff != 0
        if not todo.any():
            break
        idx = np.argmax(freqs, axis=1)
        rows_i = np.nonzero(todo)[0]
        take = diff[rows_i]
        cap = freqs[rows_i, idx[rows_i]] - 1
        adj = np.where(take > 0, take, np.maximum(take, -cap))
        freqs[rows_i, idx[rows_i]] += adj
        diff[rows_i] -= adj
    if (diff != 0).any():
        raise ValueError("cannot normalize pmf batch to 2^16")
    cdf = np.zeros((r, s + 2), np.uint32)  # [0, cumsum of S+1 freqs]
    cdf[:, 1:] = np.cumsum(freqs, axis=1)
    return cdf


def _norm_cdf(x: np.ndarray) -> np.ndarray:
    from scipy.special import erf

    return 0.5 * (1.0 + erf(x / np.sqrt(2.0)))


def build_gmm_cdf_rows(
    scales: np.ndarray,
    means: np.ndarray,
    logits: np.ndarray,
    max_support: int = 192,
    tail_sigma: float = 6.0,
) -> tuple:
    """Per-symbol CDF rows for a batch of K-component Gaussian mixtures.

    scales/means/logits: (..., K); flattened to R rows.  The symbol support
    of each row spans [floor(min_k mu_k) - T, ceil(max_k mu_k) + T] with
    T = ceil(tail_sigma * max_k sigma_k) (common width per batch, escape +
    bypass covers outliers bit-exactly).  Returns
    (cdfs (R, S+2) uint32, sizes (R,) int32, offsets (R,) int32).
    """
    k = scales.shape[-1]
    sc = np.maximum(np.asarray(scales, np.float64).reshape(-1, k), SCALE_BOUND)
    mu = np.asarray(means, np.float64).reshape(-1, k)
    lg = np.asarray(logits, np.float64).reshape(-1, k)
    w = np.exp(lg - lg.max(axis=1, keepdims=True))
    w /= w.sum(axis=1, keepdims=True)

    t = np.ceil(tail_sigma * sc.max(axis=1))
    lo = np.floor(mu.min(axis=1) - t).astype(np.int64)
    hi = np.ceil(mu.max(axis=1) + t).astype(np.int64)
    width = int((hi - lo).max()) + 1
    if width > max_support:
        width = max_support
    # symbol values per row: lo .. lo + width - 1
    v = lo[:, None] + np.arange(width)[None, :]  # (R, W)
    upper = _norm_cdf((v[..., None] + 0.5 - mu[:, None, :]) / sc[:, None, :])
    lower = _norm_cdf((v[..., None] - 0.5 - mu[:, None, :]) / sc[:, None, :])
    pmf = np.einsum("rwk,rk->rw", upper - lower, w)
    tails = np.maximum(1.0 - pmf.sum(axis=1), 0.0)
    cdfs = pmf_to_quantized_cdf_batch(pmf, tails)
    sizes = np.full(lo.shape, width + 1, np.int32)  # + escape slot
    return cdfs, sizes, lo.astype(np.int32)


def _pad_rows(rows, sizes):
    """Stack variable-length CDF rows into a (R, stride) matrix."""
    stride = max(len(r) for r in rows)
    out = np.zeros((len(rows), stride), np.uint32)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
        out[i, len(r):] = r[-1]
    return out


def build_eb_tables(eb_params: Dict, tail_mass: float = 1e-9) -> Dict:
    """CDF tables for an EntropyBottleneck parameter dict.

    Returns {cdfs, cdf_sizes, offsets, medians} (numpy).
    """
    import jax.numpy as jnp

    quantiles = np.asarray(eb_params["quantiles"])  # (C, 1, 3)
    medians = quantiles[:, 0, 1]
    minima = np.ceil(medians - quantiles[:, 0, 0]).astype(np.int64)
    maxima = np.ceil(quantiles[:, 0, 2] - medians).astype(np.int64)
    minima = np.maximum(minima, 0)
    maxima = np.maximum(maxima, 0)
    c = quantiles.shape[0]

    rows, sizes, offsets = [], [], []
    max_len = int((minima + maxima).max()) + 1
    # sample all channels on a common lattice, then cut per channel
    samples = np.arange(max_len, dtype=np.float32)  # offsets from start
    start = (medians - minima).astype(np.float32)
    grid = start[:, None] + samples[None, :]  # (C, max_len)
    lik = np.asarray(
        eb_likelihood(
            {k: jnp.asarray(v) for k, v in eb_params.items() if k != "quantiles"},
            jnp.asarray(grid[:, None, :]),
        )
    )[:, 0, :]
    # per-channel tail mass from the true CDF logits
    lower_logit = np.asarray(
        eb_logits_cumulative(
            {k: jnp.asarray(v) for k, v in eb_params.items() if k != "quantiles"},
            jnp.asarray((start - 0.5)[:, None, None]),
        )
    )[:, 0, 0]
    end = start + (minima + maxima).astype(np.float32)
    upper_logit = np.asarray(
        eb_logits_cumulative(
            {k: jnp.asarray(v) for k, v in eb_params.items() if k != "quantiles"},
            jnp.asarray((end + 0.5)[:, None, None]),
        )
    )[:, 0, 0]
    tails = 1.0 / (1.0 + np.exp(-lower_logit)) + 1.0 / (1.0 + np.exp(upper_logit))

    for ch in range(c):
        n = int(minima[ch] + maxima[ch]) + 1
        pmf = lik[ch, :n]
        cdf = pmf_to_quantized_cdf(pmf, float(tails[ch]))
        rows.append(cdf)
        sizes.append(len(cdf) - 1)
        offsets.append(-int(minima[ch]))

    return {
        "cdfs": _pad_rows(rows, sizes),
        "cdf_sizes": np.asarray(sizes, np.int32),
        "offsets": np.asarray(offsets, np.int32),
        "medians": medians.astype(np.float32),
    }


def build_gc_tables(
    scale_table: np.ndarray | None = None, tail_mass: float = 1e-9
) -> Dict:
    """CDF tables for the conditional Gaussian over a scale table."""
    if scale_table is None:
        scale_table = np.asarray(default_scale_table())
    scale_table = np.asarray(scale_table, np.float64)

    multiplier = -stats.norm.ppf(tail_mass / 2.0)
    centers = np.ceil(scale_table * multiplier).astype(np.int64)

    rows, sizes, offsets = [], [], []
    for s, center in zip(scale_table, centers):
        v = np.arange(-center, center + 1, dtype=np.float64)
        upper = stats.norm.cdf((v + 0.5) / s)
        lower = stats.norm.cdf((v - 0.5) / s)
        pmf = upper - lower
        tail = 2.0 * stats.norm.cdf((-0.5 - center) / s)
        cdf = pmf_to_quantized_cdf(pmf, tail)
        rows.append(cdf)
        sizes.append(len(cdf) - 1)
        offsets.append(-int(center))

    return {
        "cdfs": _pad_rows(rows, sizes),
        "cdf_sizes": np.asarray(sizes, np.int32),
        "offsets": np.asarray(offsets, np.int32),
        "scale_table": scale_table.astype(np.float32),
    }


def gc_build_indexes(scales: np.ndarray, scale_table: np.ndarray) -> np.ndarray:
    """Row index per element: smallest i with scale <= scale_table[i]
    (CompressAI convention); scales floored at SCALE_BOUND."""
    scales = np.maximum(np.asarray(scales, np.float64), SCALE_BOUND)
    return np.searchsorted(scale_table[:-1], scales, side="left").astype(np.int32)


def ideal_bits(symbols, indexes, cdfs, cdf_sizes, offsets) -> float:
    """Ideal bit cost of coding ``symbols`` with the exact CDF rows and
    escape/bypass scheme the rANS coder runs (`native/rans/rans.cc:132-167`):
    in-alphabet symbols cost -log2 of their quantized slot probability;
    out-of-range symbols cost the escape slot plus 4-bit bypass chunks
    (15 per chunk, continuation-coded).  Real bytes minus this is rANS
    integer-arithmetic noise plus flush; the model's differentiable rate
    estimate minus this is table calibration error.  Works for precomputed
    table rows (indexes select rows) and per-symbol rows (indexes = arange)
    alike — the AR-family audit VERDICT r4 #3 asked for.

    NOT a strict floor: with 16-bit probabilities and L = 2^16, the
    truncating state update ``floor(state/freq) << 16`` can spend up to ~1
    bit LESS than -log2(p_quantized) on a high-probability symbol for a
    specific realization (measured ~-0.05 bits/symbol on a peaked random-
    weight stream; Kraft holds in expectation, not per-sequence).  Treat
    real-vs-ideal deviations beyond ~1-2% as structural."""
    symbols = np.asarray(symbols).ravel()
    indexes = np.asarray(indexes).ravel()
    sizes = cdf_sizes[indexes]
    max_sym = sizes - 1  # escape slot id per row (rans.cc:136)
    value = symbols - offsets[indexes]  # alphabet space (rans.cc:137)
    neg = value < 0
    pos = value >= max_sym
    bypass_val = np.where(
        neg, -2 * value - 1, np.where(pos, 2 * (value - max_sym), 0)
    )
    slot = np.where(neg | pos, max_sym, value)
    rows = cdfs[indexes]
    ar = np.arange(slot.size)
    p = (rows[ar, slot + 1].astype(np.float64) - rows[ar, slot]) / float(
        1 << PRECISION
    )
    bits = -np.log2(np.maximum(p, 2.0 ** -PRECISION))
    # 4-bit chunks of value 15 continue; the final chunk (< 15) stops
    bits += np.where(neg | pos, 4.0 * (bypass_val // 15 + 1), 0.0)
    return float(bits.sum())
