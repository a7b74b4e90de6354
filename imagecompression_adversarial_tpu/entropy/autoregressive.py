"""Sequential (decode-order) coding for autoregressive context models.

The real-coder path of mbt2018 / cheng2020: each latent pixel's Gaussian
parameters depend on already-decoded neighbours through the masked 5x5
context conv, so decoding is inherently raster-sequential (SURVEY §7.3
"hard parts" — the parallel masked-conv estimation path used by every
attack lives in `models.codecs`; this module exists only for real
bitstreams).

Design: the deep transforms (g_a, h_a, h_s, g_s) run on TPU; the
autoregressive loop runs on host over extracted numpy weights (per pixel:
one masked 5x5xMx2M contraction + three 1x1 matmuls), interleaved with the
C++ streaming rANS decoder.  Symbols follow CompressAI's real-coder
convention: mean-centered rounding, y_hat = symbol + mean.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from .rans import StreamingDecoder, encode_with_indexes
from .tables import gc_build_indexes


def _leaky(x):
    return np.where(x > 0, x, 0.01 * x)


class ARWeights:
    """Numpy views of the context-prediction + entropy-parameters weights."""

    def __init__(self, params: Dict):
        k = np.asarray(params["context_prediction"]["kernel"], np.float32)
        kh, kw, cin, cout = k.shape
        mask = np.ones((kh, kw, 1, 1), np.float32)
        mask[kh // 2, kw // 2 :] = 0.0
        mask[kh // 2 + 1 :] = 0.0
        self.ctx_kernel = k * mask
        self.ctx_bias = np.asarray(params["context_prediction"]["bias"], np.float32)
        self.ep = []
        for name in ("entropy_parameters_0", "entropy_parameters_2",
                     "entropy_parameters_4"):
            w = np.asarray(params[name]["kernel"], np.float32)[0, 0]  # (in, out)
            b = np.asarray(params[name]["bias"], np.float32)
            self.ep.append((w, b))
        self.m = cin

    def gaussian_params(self, window: np.ndarray, hyper_feat: np.ndarray):
        """window: (5, 5, M) decoded neighbourhood; hyper_feat: (2M,).
        Returns (scales (M,), means (M,))."""
        ctx = np.tensordot(window, self.ctx_kernel, axes=([0, 1, 2], [0, 1, 2]))
        ctx = ctx + self.ctx_bias
        feat = np.concatenate([hyper_feat, ctx])
        for i, (w, b) in enumerate(self.ep):
            feat = feat @ w + b
            if i < len(self.ep) - 1:
                feat = _leaky(feat)
        scales, means = np.split(feat, 2)
        return scales, means


def ar_encode(
    y: np.ndarray,
    hyper_params: np.ndarray,
    weights: ARWeights,
    gc_tables: Dict,
) -> bytes:
    """Sequentially encode y (h, w, M) given h_s output (h, w, 2M)."""
    h, w, m = y.shape
    pad = 2
    y_hat = np.zeros((h + 4, w + 4, m), np.float32)
    symbols: List[np.ndarray] = []
    indexes: List[np.ndarray] = []
    table = gc_tables["scale_table"]
    for i in range(h):
        for j in range(w):
            window = y_hat[i : i + 5, j : j + 5]
            scales, means = weights.gaussian_params(window, hyper_params[i, j])
            idx = gc_build_indexes(scales, table)
            sym = np.round(y[i, j] - means).astype(np.int32)
            y_hat[i + pad, j + pad] = sym + means
            symbols.append(sym)
            indexes.append(idx)
    return encode_with_indexes(
        np.concatenate(symbols),
        np.concatenate(indexes),
        gc_tables["cdfs"],
        gc_tables["cdf_sizes"],
        gc_tables["offsets"],
    )


def ar_decode(
    string: bytes,
    hyper_params: np.ndarray,
    weights: ARWeights,
    gc_tables: Dict,
) -> np.ndarray:
    """Sequentially decode to y_hat (h, w, M)."""
    h, w, _ = hyper_params.shape
    m = weights.m
    pad = 2
    y_hat = np.zeros((h + 4, w + 4, m), np.float32)
    dec = StreamingDecoder(
        string, gc_tables["cdfs"], gc_tables["cdf_sizes"], gc_tables["offsets"]
    )
    table = gc_tables["scale_table"]
    try:
        for i in range(h):
            for j in range(w):
                window = y_hat[i : i + 5, j : j + 5]
                scales, means = weights.gaussian_params(
                    window, hyper_params[i, j]
                )
                idx = gc_build_indexes(scales, table)
                sym = dec.decode(idx)
                y_hat[i + pad, j + pad] = sym + means
    finally:
        dec.close()
    return y_hat[pad : pad + h, pad : pad + w]
