"""Real bitstream compression: JAX transforms + native rANS coder.

The equivalent of CompressAI's ``model.compress()/decompress()`` (reached by
the reference at e.g. `/root/reference/attack_TIC.py:106-116`): analysis
transforms and entropy parameters run on TPU; symbols stream through the
C++ rANS coder on host; synthesis runs back on TPU.

Supported: every entropy structure in the framework — factorized, scale
hyperprior, mean-scale, the autoregressive context families (mbt2018 /
cheng2020, wavefront-parallel host loop), cheng2020-gmm (per-pixel
mixture CDFs built on the fly; `entropy/autoregressive.py`), and fic's
4-phase checkerboard context (``context4``: one TPU context pass to
encode, four to decode — the parallel-decode payoff `models/fic.py`
promises).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import rans
from .autoregressive import (
    ARWeights,
    ar_decode,
    ar_decode_gmm,
    ar_encode,
    ar_encode_gmm,
)
from .gaussian import default_scale_table
from .tables import (
    build_eb_tables,
    build_gc_tables,
    gc_build_indexes,
    ideal_bits,
)


class RealCodec:
    """Bit-exact encode/decode around a trained codec."""

    SUPPORTED = (
        "factorized", "scale_hyper", "mean_scale", "context", "context_gmm",
        "context4",
    )

    def __init__(self, module, params):
        self.module = module
        self.params = params
        structure = getattr(module, "entropy_structure", "none")
        if structure not in self.SUPPORTED:
            raise NotImplementedError(
                f"real-coder path does not support {type(module).__name__} "
                f"(entropy_structure={structure!r})"
            )
        self.structure = structure
        self.is_factorized = structure == "factorized"
        self.is_hyper = structure == "scale_hyper"
        self.is_meanscale = structure == "mean_scale"
        self.is_gmm = structure == "context_gmm"
        self.is_context = structure == "context" or self.is_gmm
        self.is_context4 = structure == "context4"

        self.eb_tables = build_eb_tables(params["entropy_bottleneck"])
        if not self.is_factorized:
            self.gc_tables = build_gc_tables(np.asarray(default_scale_table()))
        if self.is_context:
            self.ar_weights = ARWeights(
                params, gmm_k=getattr(module, "K", 0) if self.is_gmm else 0
            )
        # params are passed to every jitted stage as a RUNTIME argument, not
        # a closure: closed-over params become compile-time constants
        # embedded in the program, which (a) bloats the compile payload past
        # the axon relay's request limit for big families (HTTP 413 at
        # invcompress's 207M params) and (b) defeats executable reuse
        if self.is_context4:
            # the checkerboard context runs as a full TPU conv pass; phase-k
            # outputs depend only on phases < k (masked), so the SAME jitted
            # program serves the encoder's single full-canvas call and the
            # decoder's four progressive calls bit-exactly
            _context = jax.jit(
                lambda p, y_hat, hf: module.apply(
                    {"params": p}, y_hat, hf,
                    method=lambda m, a, b: m.context(a, b),
                )
            )
            self._context = lambda y_hat, hf: _context(self.params, y_hat, hf)

        _g_a = jax.jit(
            lambda p, x: module.apply({"params": p}, x, method=module.g_a)
        )
        self._g_a = lambda x: _g_a(self.params, x)
        _g_s = jax.jit(
            lambda p, y: module.apply({"params": p}, y, method=module.g_s)
        )
        self._g_s = lambda y: _g_s(self.params, y)
        if not self.is_factorized:
            if self.is_hyper:
                # scale hyperprior conditions on |y| (ref `anchors/model.py:92`)
                _h_a = jax.jit(
                    lambda p, y: module.apply(
                        {"params": p}, jnp.abs(y), method=module.h_a
                    )
                )
            else:
                _h_a = jax.jit(
                    lambda p, y: module.apply({"params": p}, y, method=module.h_a)
                )
            self._h_a = lambda y: _h_a(self.params, y)
            _h_s = jax.jit(
                lambda p, z: module.apply({"params": p}, z, method=module.h_s)
            )
            self._h_s = lambda z: _h_s(self.params, z)

    # ------------------------------------------------------------------ EB

    def _eb_encode(self, z: np.ndarray) -> Tuple[bytes, np.ndarray, float]:
        """Encode NHWC latents with the factorized model (channel-indexed).
        Returns (string, z_hat, ideal_bits-of-these-symbols)."""
        t = self.eb_tables
        c = z.shape[-1]
        medians = t["medians"].reshape(1, 1, 1, c)
        symbols = np.round(z - medians).astype(np.int32)
        indexes = np.broadcast_to(
            np.arange(c, dtype=np.int32), z.shape
        ).ravel()
        string = rans.encode_with_indexes(
            symbols.ravel(), indexes, t["cdfs"], t["cdf_sizes"], t["offsets"]
        )
        bits = ideal_bits(
            symbols, indexes, t["cdfs"], t["cdf_sizes"], t["offsets"]
        )
        z_hat = symbols.astype(np.float32) + medians
        return string, z_hat, bits

    def _eb_decode(self, string: bytes, shape) -> np.ndarray:
        t = self.eb_tables
        c = shape[-1]
        indexes = np.broadcast_to(np.arange(c, dtype=np.int32), shape).ravel()
        symbols = rans.decode_with_indexes(
            string, indexes, t["cdfs"], t["cdf_sizes"], t["offsets"]
        )
        medians = t["medians"].reshape(1, 1, 1, c)
        return symbols.reshape(shape).astype(np.float32) + medians

    # ----------------------------------------------------- context4 (fic)

    @staticmethod
    def _checkerboard_phases(h: int, w: int):
        """Per-phase (ii, jj) index arrays in fic's decode order
        (models/fic.py::_phase_masks): (0,0) -> (1,1) -> (0,1) -> (1,0)."""
        ii, jj = np.mgrid[0:h, 0:w]
        return [
            np.nonzero((ii % 2 == a) & (jj % 2 == b))
            for a, b in ((0, 0), (1, 1), (0, 1), (1, 0))
        ]

    @staticmethod
    def _gauss_cdf_rows(scales: np.ndarray, means: np.ndarray):
        """Per-symbol CDF rows for arbitrary-mean single Gaussians (fic codes
        means-free-rounded symbols, so the fractional mean shift lives in the
        CDF row, like the GMM path).  Scales are clamped into the same
        [SCALE_BOUND, SCALES_MAX] grid the differentiable estimate uses
        (`entropy/gaussian.py::gaussian_likelihood`), so est-vs-ideal
        deviations are pure calibration, never clamp asymmetry.  NOTE:
        the clamp is wire-format-affecting — context4 bitstreams written
        before round 5 whose scale head left [0.11, 256] do not decode
        under this version (encode/decode are version-paired; no persisted
        bitstream compatibility is promised)."""
        from .gaussian import SCALE_BOUND, SCALES_MAX
        from .tables import build_gmm_cdf_rows

        scales = np.clip(scales, SCALE_BOUND, SCALES_MAX)
        zeros = np.zeros_like(scales)
        return build_gmm_cdf_rows(
            scales[..., None], means[..., None], zeros[..., None]
        )

    def _context4_encode(self, y: np.ndarray, hyper_feats,
                         stats: Optional[Dict] = None) -> bytes:
        """One full context pass; phase masking guarantees the params match
        the decoder's progressive passes bitwise (`models/fic.py:20-28`).
        ``stats['ideal_bits']`` records the entropy floor of these symbols."""
        y_q = np.round(y).astype(np.float32)
        scales, means = (
            np.asarray(a) for a in self._context(jnp.asarray(y_q), hyper_feats)
        )
        h, w = y.shape[1:3]
        symbols, rows, sizes, offs = [], [], [], []
        for iis, jjs in self._checkerboard_phases(h, w):
            sc, mu = scales[0, iis, jjs], means[0, iis, jjs]
            r, s, o = self._gauss_cdf_rows(sc.ravel(), mu.ravel())
            symbols.append(y_q[0, iis, jjs].astype(np.int32).ravel())
            rows.append(r)
            sizes.append(s)
            offs.append(o)
        symbols_flat = np.concatenate(symbols)
        stride = max(r.shape[1] for r in rows)
        cdfs = np.zeros((symbols_flat.size, stride), np.uint32)
        pos = 0
        for r in rows:
            n, s = r.shape
            cdfs[pos : pos + n, :s] = r
            if s < stride:
                cdfs[pos : pos + n, s:] = r[:, -1:]
            pos += n
        sizes_flat = np.concatenate(sizes)
        offs_flat = np.concatenate(offs)
        idx = np.arange(symbols_flat.size, dtype=np.int32)
        if stats is not None:
            stats["ideal_bits"] = ideal_bits(
                symbols_flat, idx, cdfs, sizes_flat, offs_flat
            )
        return rans.encode_with_indexes(
            symbols_flat, idx, cdfs, sizes_flat, offs_flat
        )

    def _context4_decode(self, string: bytes, hyper_feats, h: int, w: int,
                         m: int) -> np.ndarray:
        """Four progressive context passes — the parallel-decode payoff of
        the checkerboard design (vs H*W sequential steps for a raster AR
        model)."""
        canvas = np.zeros((1, h, w, m), np.float32)
        dec = None
        try:
            for iis, jjs in self._checkerboard_phases(h, w):
                scales, means = (
                    np.asarray(a)
                    for a in self._context(jnp.asarray(canvas), hyper_feats)
                )
                sc, mu = scales[0, iis, jjs], means[0, iis, jjs]
                rows, sizes, offs = self._gauss_cdf_rows(sc.ravel(), mu.ravel())
                idx = np.arange(sizes.size, dtype=np.int32)
                if dec is None:
                    dec = rans.StreamingDecoder(string, rows, sizes, offs)
                    sym = dec.decode(idx)
                else:
                    sym = dec.decode(idx, cdfs=rows, cdf_sizes=sizes, offsets=offs)
                canvas[0, iis, jjs] = sym.reshape(-1, m).astype(np.float32)
        finally:
            if dec is not None:
                dec.close()
        return canvas

    # ------------------------------------------------------------ public

    def compress(self, x) -> Dict:
        """x: (1, H, W, 3) in [0,1] -> {"strings": [...], "shape": (h, w),
        "ideal_bits": float}.

        ``ideal_bits`` is the entropy floor of exactly the symbols written,
        under exactly the CDF rows they were coded with — for EVERY family,
        including the sequential AR paths (the encoder holds the exact CDF
        row per symbol at encode time, so the audit is free).  real bytes*8
        minus this is rANS overhead; the model's differentiable ``est_bpp``
        minus this/num_pixels is table/estimator calibration error (the
        reference's estimate-vs-compress() duality,
        `/root/reference/anchors/model.py:86-108` vs `attack_TIC.py:106-116`).
        """
        y = np.asarray(self._g_a(jnp.asarray(x)))
        if self.is_factorized:
            y_string, _, y_bits = self._eb_encode(y)
            return {"strings": [y_string], "shape": y.shape[1:3],
                    "ideal_bits": y_bits}

        z = np.asarray(self._h_a(jnp.asarray(y)))
        z_string, z_hat, z_bits = self._eb_encode(z)
        st: Dict = {}

        if self.is_context:
            hyper_params = np.asarray(self._h_s(jnp.asarray(z_hat)))
            if self.is_gmm:
                y_string = ar_encode_gmm(
                    y[0], hyper_params[0], self.ar_weights, stats=st
                )
            else:
                y_string = ar_encode(
                    y[0], hyper_params[0], self.ar_weights, self.gc_tables,
                    stats=st,
                )
            return {"strings": [y_string, z_string], "shape": z.shape[1:3],
                    "ideal_bits": st["ideal_bits"] + z_bits}

        if self.is_context4:
            hyper_feats = self._h_s(jnp.asarray(z_hat))
            y_string = self._context4_encode(y, hyper_feats, stats=st)
            return {"strings": [y_string, z_string], "shape": z.shape[1:3],
                    "ideal_bits": st["ideal_bits"] + z_bits}

        gp = np.asarray(self._h_s(jnp.asarray(z_hat)))
        t = self.gc_tables
        if self.is_meanscale:
            scales, means = np.split(gp, 2, axis=-1)
            symbols = np.round(y - means).astype(np.int32).ravel()
        else:  # scale-only hyperprior (means-free rounding)
            scales = gp
            symbols = np.round(y).astype(np.int32).ravel()
        indexes = gc_build_indexes(scales, t["scale_table"]).ravel()
        y_string = rans.encode_with_indexes(
            symbols, indexes, t["cdfs"], t["cdf_sizes"], t["offsets"]
        )
        y_bits = ideal_bits(
            symbols, indexes, t["cdfs"], t["cdf_sizes"], t["offsets"]
        )
        return {"strings": [y_string, z_string], "shape": z.shape[1:3],
                "ideal_bits": y_bits + z_bits}

    def decompress(self, strings: List[bytes], shape) -> np.ndarray:
        """Inverse of compress; returns the reconstruction in [0,1]."""
        if self.is_factorized:
            (y_string,) = strings
            h, w = shape
            c = self.eb_tables["medians"].shape[0]
            y_hat = self._eb_decode(y_string, (1, h, w, c))
            x_hat = np.asarray(self._g_s(jnp.asarray(y_hat)))
            return np.clip(x_hat, 0.0, 1.0)

        y_string, z_string = strings
        h, w = shape
        cz = self.eb_tables["medians"].shape[0]
        z_hat = self._eb_decode(z_string, (1, h, w, cz))

        if self.is_context:
            hyper_params = np.asarray(self._h_s(jnp.asarray(z_hat)))
            if self.is_gmm:
                y_hat = ar_decode_gmm(y_string, hyper_params[0], self.ar_weights)[None]
            else:
                y_hat = ar_decode(
                    y_string, hyper_params[0], self.ar_weights, self.gc_tables
                )[None]
            x_hat = np.asarray(self._g_s(jnp.asarray(y_hat)))
            return np.clip(x_hat, 0.0, 1.0)

        if self.is_context4:
            hyper_feats = self._h_s(jnp.asarray(z_hat))
            hy, wy = hyper_feats.shape[1:3]
            y_hat = self._context4_decode(
                y_string, hyper_feats, hy, wy, self.module.M
            )
            x_hat = np.asarray(self._g_s(jnp.asarray(y_hat)))
            return np.clip(x_hat, 0.0, 1.0)

        gp = np.asarray(self._h_s(jnp.asarray(z_hat)))
        t = self.gc_tables
        if self.is_meanscale:
            scales, means = np.split(gp, 2, axis=-1)
        else:
            scales, means = gp, None
        indexes = gc_build_indexes(scales, t["scale_table"]).ravel()
        symbols = rans.decode_with_indexes(
            y_string, indexes, t["cdfs"], t["cdf_sizes"], t["offsets"]
        )
        y_hat = symbols.reshape(scales.shape).astype(np.float32)
        if means is not None:
            y_hat = y_hat + means
        x_hat = np.asarray(self._g_s(jnp.asarray(y_hat)))
        return np.clip(x_hat, 0.0, 1.0)

    def real_bpp(self, result: Dict, num_pixels: int) -> float:
        return sum(len(s) for s in result["strings"]) * 8.0 / num_pixels

    # kept as a method alias: the audit math lives in tables.ideal_bits so
    # the AR encoders can use it without importing this module
    _ideal_bits = staticmethod(ideal_bits)

    def table_bpp(self, x, num_pixels: int) -> Optional[float]:
        """Entropy floor (bits/pixel) of exactly the symbols ``compress``
        writes, under the table CDFs it codes them with: the table-snapped
        Gaussian rows for y plus the factorized rows for z.  This is the
        clamp-aware estimate VERDICT r3 asked for — ``real_bpp`` minus this
        is coder overhead, and the model's forward ``est_bpp`` minus this
        is scale-table calibration error.  Only the one-shot hyperprior
        paths (scale-only / mean-scale) are supported WITHOUT a compress
        call; context/AR families return None here because their CDFs
        depend on sequential decode state — for those, use the
        ``ideal_bits`` field ``compress()`` now returns (same audit,
        computed from the exact per-symbol rows at encode time)."""
        if self.is_factorized or self.is_context or self.is_context4:
            return None
        y = np.asarray(self._g_a(jnp.asarray(x)))
        z = np.asarray(self._h_a(jnp.asarray(y)))
        t_eb = self.eb_tables
        c = z.shape[-1]
        medians = t_eb["medians"].reshape(1, 1, 1, c)
        z_syms = np.round(z - medians).astype(np.int32)
        z_idx = np.broadcast_to(np.arange(c, dtype=np.int32), z.shape)
        bits = self._ideal_bits(
            z_syms, z_idx, t_eb["cdfs"], t_eb["cdf_sizes"], t_eb["offsets"]
        )
        z_hat = z_syms.astype(np.float32) + medians
        gp = np.asarray(self._h_s(jnp.asarray(z_hat)))
        t = self.gc_tables
        if self.is_meanscale:
            scales, means = np.split(gp, 2, axis=-1)
            y_syms = np.round(y - means).astype(np.int32)
        else:
            scales = gp
            y_syms = np.round(y).astype(np.int32)
        y_idx = gc_build_indexes(scales, t["scale_table"])
        bits += self._ideal_bits(
            y_syms, y_idx, t["cdfs"], t["cdf_sizes"], t["offsets"]
        )
        return bits / num_pixels
