"""Sequential (decode-order) coding for autoregressive context models.

The real-coder path of mbt2018 / cheng2020 / cheng2020-gmm: each latent
pixel's entropy parameters depend on already-decoded neighbours through the
masked 5x5 context conv, so decoding has a sequential data dependency
(SURVEY §7.3 "hard parts" — the parallel masked-conv estimation path used by
every attack lives in `models.codecs`; this module exists only for real
bitstreams).

Wavefront parallelism: with the raster-causal 5x5 mask, pixel (i, j)
depends only on pixels (i', j') with 3*i' + j' < 3*i + j (row above may
contribute up to j+2, and 3*(i-1) + (j+2) = 3*i + j - 1).  So all pixels on
the anti-diagonal t = 3*i + j are mutually independent and are processed as
ONE batch: a single (P, 5*5*M) x (5*5*M, C_out) matmul for the context
conv, batched 1x1 matmuls for the entropy-parameters head, and one
chunk-decode call into the streaming rANS decoder.  A (h, w) latent needs
3*h + w - 3 steps instead of h*w — ~11x fewer for Kodak-sized latents —
and each step is BLAS-shaped instead of per-pixel Python.

Encoder/decoder bit-exactness: both sides build parameters with the same
batched kernels over identically composed wavefront batches, so the float
results (and hence the CDF rows) are bitwise identical.

GMM support (cheng2020-gmm): the entropy-parameters head emits K-component
mixtures; per-symbol CDF rows are built on the fly per wavefront
(`tables.build_gmm_cdf_rows`) and passed to the per-call table interface of
the native coder — there is no precomputable scale-table analog for
mixtures (ref AR+GMM path analog: `/root/reference/attack_nlaic.py:62-68`).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .rans import StreamingDecoder, encode_with_indexes
from .tables import build_gmm_cdf_rows, gc_build_indexes, ideal_bits


def _leaky(x):
    return np.where(x > 0, x, 0.01 * x)


def wavefronts(h: int, w: int) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Anti-diagonal schedule for the raster-causal 5x5 mask: groups of
    (i, j) with equal t = 3*i + j, ascending."""
    ii, jj = np.mgrid[0:h, 0:w]
    t = (3 * ii + jj).ravel()
    order = np.argsort(t, kind="stable")
    ts = t[order]
    iis, jjs = ii.ravel()[order], jj.ravel()[order]
    bounds = np.searchsorted(ts, np.arange(ts[-1] + 2))
    fronts = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        if a < b:
            fronts.append((iis[a:b], jjs[a:b]))
    return fronts


class ARWeights:
    """Numpy views of the context-prediction + entropy-parameters weights.

    ``gmm_k``: number of mixture components when the head emits a GMM
    (3*K*M output channels laid out as in
    `models/codecs.py::Cheng2020AttnGMM.from_latent`); 0 = single Gaussian
    (scales/means split).
    """

    def __init__(self, params: Dict, gmm_k: int = 0):
        k = np.asarray(params["context_prediction"]["kernel"], np.float32)
        kh, kw, cin, cout = k.shape
        mask = np.ones((kh, kw, 1, 1), np.float32)
        mask[kh // 2, kw // 2 :] = 0.0
        mask[kh // 2 + 1 :] = 0.0
        km = k * mask
        self.ctx_kernel = km  # (5, 5, M, C_out) masked kernel
        # flattened for the wavefront batch matmul: (5*5*M, C_out)
        self.ctx_kernel_flat = km.reshape(kh * kw * cin, cout)
        # the raster mask keeps only 12 of 25 taps (rows above + left of
        # center); contracting just those halves the context-conv FLOPs
        ti, tj = np.nonzero(mask[:, :, 0, 0])
        self.tap_i, self.tap_j = ti, tj
        self.ctx_kernel_taps = np.ascontiguousarray(
            km[ti, tj].reshape(ti.size * cin, cout)
        )
        self.ctx_bias = np.asarray(params["context_prediction"]["bias"], np.float32)
        self.ep = []
        for name in ("entropy_parameters_0", "entropy_parameters_2",
                     "entropy_parameters_4"):
            w = np.asarray(params[name]["kernel"], np.float32)[0, 0]  # (in, out)
            b = np.asarray(params[name]["bias"], np.float32)
            self.ep.append((w, b))
        # the first entropy-parameters matmul consumes [hyper_feats, ctx];
        # its hyper half is wavefront-invariant, so it is applied ONCE over
        # the whole image (precompute_hyper) and only the ctx half stays in
        # the sequential loop
        w0, b0 = self.ep[0]
        self.ep0_ctx = np.ascontiguousarray(w0[-cout:])     # (C_ctx, C0)
        self.ep0_hyper = np.ascontiguousarray(w0[:-cout])   # (F_h, C0)
        self.ep0_bias = b0
        self.m = cin
        self.ksize = kh
        self.gmm_k = gmm_k

    def precompute_hyper(self, hyper_params: np.ndarray) -> np.ndarray:
        """(h, w, F_h) hyper features -> (h, w, C0): the image-wide hyper
        half of the first entropy-parameters layer (incl. bias + the
        context-conv bias folded through ep0_ctx)."""
        h, w, f = hyper_params.shape
        base = hyper_params.reshape(-1, f) @ self.ep0_hyper + self.ep0_bias
        base = base + self.ctx_bias @ self.ep0_ctx
        return base.reshape(h, w, -1)

    def head_from_pre(self, tap_windows: np.ndarray, pre: np.ndarray):
        """tap_windows: (P, T, M) causal-tap neighbourhoods; pre: (P, C0)
        precomputed hyper half.  Same outputs as :meth:`head`."""
        p = tap_windows.shape[0]
        ctx = tap_windows.reshape(p, -1) @ self.ctx_kernel_taps
        feat = _leaky(pre + ctx @ self.ep0_ctx)
        for i, (w, b) in enumerate(self.ep[1:]):
            feat = feat @ w + b
            if i < len(self.ep) - 2:
                feat = _leaky(feat)
        if self.gmm_k:
            g = feat.reshape(p, 3, self.gmm_k, self.m).transpose(0, 3, 2, 1)
            return g[..., 0], g[..., 1], g[..., 2]
        scales, means = np.split(feat, 2, axis=1)
        return scales, means

    def head(self, windows: np.ndarray, hyper_feats: np.ndarray):
        """windows: (P, 5, 5, M) decoded neighbourhoods; hyper_feats: (P, F).

        Single Gaussian: returns (scales (P, M), means (P, M)).
        GMM:             returns (scales, means, logits) each (P, M, K).
        """
        p = windows.shape[0]
        ctx = windows.reshape(p, -1) @ self.ctx_kernel_flat + self.ctx_bias
        feat = np.concatenate([hyper_feats, ctx], axis=1)
        for i, (w, b) in enumerate(self.ep):
            feat = feat @ w + b
            if i < len(self.ep) - 1:
                feat = _leaky(feat)
        if self.gmm_k:
            # (P, 3*K*M) -> (P, 3, K, M) -> per-quantity (P, M, K)
            g = feat.reshape(p, 3, self.gmm_k, self.m).transpose(0, 3, 2, 1)
            return g[..., 0], g[..., 1], g[..., 2]
        scales, means = np.split(feat, 2, axis=1)
        return scales, means

    def gaussian_params(self, window: np.ndarray, hyper_feat: np.ndarray):
        """Single-pixel convenience (window (5,5,M), hyper_feat (F,))."""
        out = self.head(window[None], hyper_feat[None])
        return tuple(o[0] for o in out)


class _WavefrontRunner:
    """Shared encode/decode iteration: maintains the padded y_hat canvas and
    yields per-wavefront (pixels, windows, entropy-head outputs)."""

    PAD = 2

    def __init__(self, hyper_params: np.ndarray, weights: ARWeights):
        self.h, self.w, _ = hyper_params.shape
        self.weights = weights
        self.y_hat = np.zeros(
            (self.h + 4, self.w + 4, weights.m), np.float32
        )
        self.fronts = wavefronts(self.h, self.w)
        # one image-wide matmul hoists the hyper half of ep0 out of the loop
        self.pre = weights.precompute_hyper(hyper_params)

    def windows_for(self, iis: np.ndarray, jjs: np.ndarray) -> np.ndarray:
        k = self.weights.ksize
        # zero-copy view of all kxk windows; fancy-gather the wavefront's
        # pixels and only the 12 causal taps
        view = np.lib.stride_tricks.sliding_window_view(
            self.y_hat, (k, k), axis=(0, 1)
        )  # (H', W', M, k, k)
        wi, wj = self.weights.tap_i, self.weights.tap_j
        return view[iis, jjs][:, :, wi, wj].transpose(0, 2, 1)  # (P, T, M)

    def params_for(self, iis, jjs):
        tap_windows = self.windows_for(iis, jjs)
        return self.weights.head_from_pre(tap_windows, self.pre[iis, jjs])

    def place(self, iis, jjs, values: np.ndarray) -> None:
        self.y_hat[iis + self.PAD, jjs + self.PAD] = values

    def result(self) -> np.ndarray:
        return self.y_hat[self.PAD : self.PAD + self.h,
                          self.PAD : self.PAD + self.w]


def ar_encode(
    y: np.ndarray,
    hyper_params: np.ndarray,
    weights: ARWeights,
    gc_tables: Dict,
    stats: Optional[Dict] = None,
) -> bytes:
    """Wavefront-encode y (h, w, M) given h_s output (h, w, F);
    single-Gaussian (table-indexed) path.  When ``stats`` is given, records
    ``stats['ideal_bits']``: the entropy floor of exactly these symbols
    under exactly these table rows (the AR-family est-vs-real audit)."""
    run = _WavefrontRunner(hyper_params, weights)
    table = gc_tables["scale_table"]
    symbols: List[np.ndarray] = []
    indexes: List[np.ndarray] = []
    for iis, jjs in run.fronts:
        scales, means = run.params_for(iis, jjs)
        idx = gc_build_indexes(scales, table)
        sym = np.round(y[iis, jjs] - means).astype(np.int32)
        run.place(iis, jjs, sym + means)
        symbols.append(sym.ravel())
        indexes.append(idx.ravel())
    symbols_flat = np.concatenate(symbols)
    indexes_flat = np.concatenate(indexes)
    if stats is not None:
        stats["ideal_bits"] = ideal_bits(
            symbols_flat, indexes_flat, gc_tables["cdfs"],
            gc_tables["cdf_sizes"], gc_tables["offsets"],
        )
    return encode_with_indexes(
        symbols_flat,
        indexes_flat,
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
    """Wavefront-decode to y_hat (h, w, M); single-Gaussian path."""
    run = _WavefrontRunner(hyper_params, weights)
    dec = StreamingDecoder(
        string, gc_tables["cdfs"], gc_tables["cdf_sizes"], gc_tables["offsets"]
    )
    table = gc_tables["scale_table"]
    try:
        for iis, jjs in run.fronts:
            scales, means = run.params_for(iis, jjs)
            idx = gc_build_indexes(scales, table)
            sym = dec.decode(idx.ravel()).reshape(means.shape)
            run.place(iis, jjs, sym + means)
    finally:
        dec.close()
    return run.result()


def ar_encode_gmm(
    y: np.ndarray,
    hyper_params: np.ndarray,
    weights: ARWeights,
    stats: Optional[Dict] = None,
) -> bytes:
    """Wavefront-encode with per-pixel Gaussian-mixture CDFs built on the
    fly.  GMM symbols are plain round(y) (the estimation path quantizes
    means-free, `models/codecs.py::Cheng2020AttnGMM`).  ``stats`` as in
    :func:`ar_encode` (per-symbol rows, so indexes are the identity)."""
    assert weights.gmm_k > 0
    run = _WavefrontRunner(hyper_params, weights)
    symbols: List[np.ndarray] = []
    all_rows: List[np.ndarray] = []
    all_sizes: List[np.ndarray] = []
    all_offsets: List[np.ndarray] = []
    for iis, jjs in run.fronts:
        scales, means, logits = run.params_for(iis, jjs)
        sym = np.round(y[iis, jjs]).astype(np.int32)
        run.place(iis, jjs, sym.astype(np.float32))
        rows, sizes, offs = build_gmm_cdf_rows(scales, means, logits)
        symbols.append(sym.ravel())
        all_rows.append(rows)
        all_sizes.append(sizes)
        all_offsets.append(offs)
    symbols_flat = np.concatenate(symbols)
    stride = max(r.shape[1] for r in all_rows)
    cdfs = np.zeros((symbols_flat.size, stride), np.uint32)
    pos = 0
    for rows in all_rows:
        r, s = rows.shape
        cdfs[pos : pos + r, :s] = rows
        if s < stride:
            cdfs[pos : pos + r, s:] = rows[:, -1:]
        pos += r
    sizes_flat = np.concatenate(all_sizes)
    offsets_flat = np.concatenate(all_offsets)
    idx = np.arange(symbols_flat.size, dtype=np.int32)
    if stats is not None:
        stats["ideal_bits"] = ideal_bits(
            symbols_flat, idx, cdfs, sizes_flat, offsets_flat
        )
    return encode_with_indexes(
        symbols_flat, idx, cdfs, sizes_flat, offsets_flat
    )


def ar_decode_gmm(
    string: bytes,
    hyper_params: np.ndarray,
    weights: ARWeights,
) -> np.ndarray:
    """Wavefront-decode the GMM bitstream to y_hat (h, w, M)."""
    assert weights.gmm_k > 0
    run = _WavefrontRunner(hyper_params, weights)
    dec: Optional[StreamingDecoder] = None
    try:
        for iis, jjs in run.fronts:
            scales, means, logits = run.params_for(iis, jjs)
            rows, sizes, offs = build_gmm_cdf_rows(scales, means, logits)
            if dec is None:
                dec = StreamingDecoder(string, rows, sizes, offs)
                sym = dec.decode(np.arange(sizes.size, dtype=np.int32))
            else:
                sym = dec.decode(
                    np.arange(sizes.size, dtype=np.int32),
                    cdfs=rows, cdf_sizes=sizes, offsets=offs,
                )
            run.place(iis, jjs, sym.reshape(means.shape[:2]).astype(np.float32))
    finally:
        if dec is not None:
            dec.close()
    return run.result()
