"""ctypes binding for the native rANS range coder (native/rans/rans.cc).

The reference reaches an equivalent C++ coder through CompressAI's
``compressai.ans`` (``BufferedRansEncoder.encode_with_indexes`` — used via
``model.compress()``, e.g. `/root/reference/attack_TIC.py:106-116`).  The
binding keeps that call shape: flat symbol + index arrays against a stack of
per-row quantized CDFs.

The library is rebuilt on demand with g++ if the shared object is missing
or stale (no pybind11 in this toolchain; plain C ABI + ctypes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "rans")
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "librans.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "rans.cc")

_lib: Optional[ctypes.CDLL] = None


def _build_library() -> None:
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-shared",
         "-o", _LIB_PATH, _SRC_PATH],
        check=True,
        cwd=_NATIVE_DIR,
    )


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB_PATH)) or (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH)
    ):
        _build_library()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rans_encode_with_indexes.restype = ctypes.c_int
    lib.rans_encode_with_indexes.argtypes = [
        ctypes.POINTER(ctypes.c_int32),  # symbols
        ctypes.POINTER(ctypes.c_int32),  # indexes
        ctypes.c_int,                    # n
        ctypes.POINTER(ctypes.c_uint32), # cdfs
        ctypes.c_int,                    # cdf_stride
        ctypes.POINTER(ctypes.c_int32),  # cdf_sizes
        ctypes.POINTER(ctypes.c_int32),  # offsets
        ctypes.POINTER(ctypes.c_uint8),  # out
        ctypes.c_int,                    # out_capacity
    ]
    lib.rans_dec_create.restype = ctypes.c_void_p
    lib.rans_dec_create.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    lib.rans_dec_decode.restype = ctypes.c_int
    lib.rans_dec_decode.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.rans_dec_free.restype = None
    lib.rans_dec_free.argtypes = [ctypes.c_void_p]
    lib.rans_decode_with_indexes.restype = ctypes.c_int
    lib.rans_decode_with_indexes.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),  # data
        ctypes.c_int,                    # data_len
        ctypes.POINTER(ctypes.c_int32),  # indexes
        ctypes.c_int,                    # n
        ctypes.POINTER(ctypes.c_uint32), # cdfs
        ctypes.c_int,                    # cdf_stride
        ctypes.POINTER(ctypes.c_int32),  # cdf_sizes
        ctypes.POINTER(ctypes.c_int32),  # offsets
        ctypes.POINTER(ctypes.c_int32),  # symbols_out
    ]
    _lib = lib
    return lib


def _as_ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def encode_with_indexes(
    symbols: Sequence[int],
    indexes: Sequence[int],
    cdfs: np.ndarray,
    cdf_sizes: Sequence[int],
    offsets: Sequence[int],
) -> bytes:
    """Encode integer symbols to a byte string.

    Args:
      symbols: (N,) int values.
      indexes: (N,) row selector into the cdf stack.
      cdfs: (R, stride) uint32 quantized CDF rows, cdf[r, 0] == 0,
        cdf[r, sizes[r]] == 1 << 16; symbol sizes[r]-1 is the escape.
      cdf_sizes: (R,) number of valid cdf entries per row minus 1.
      offsets: (R,) per-row symbol offset.
    """
    lib = _load()
    symbols = np.ascontiguousarray(symbols, np.int32)
    indexes = np.ascontiguousarray(indexes, np.int32)
    cdfs = np.ascontiguousarray(cdfs, np.uint32)
    cdf_sizes = np.ascontiguousarray(cdf_sizes, np.int32)
    offsets = np.ascontiguousarray(offsets, np.int32)
    n = symbols.size
    capacity = max(1024, n * 8)
    out = np.empty(capacity, np.uint8)
    written = lib.rans_encode_with_indexes(
        _as_ptr(symbols, ctypes.c_int32),
        _as_ptr(indexes, ctypes.c_int32),
        n,
        _as_ptr(cdfs, ctypes.c_uint32),
        cdfs.shape[1],
        _as_ptr(cdf_sizes, ctypes.c_int32),
        _as_ptr(offsets, ctypes.c_int32),
        _as_ptr(out, ctypes.c_uint8),
        capacity,
    )
    if written < 0:
        raise RuntimeError("rans encode buffer overflow")
    return bytes(out[:written])


def decode_with_indexes(
    data: bytes,
    indexes: Sequence[int],
    cdfs: np.ndarray,
    cdf_sizes: Sequence[int],
    offsets: Sequence[int],
) -> np.ndarray:
    """Decode the byte string back to (N,) int32 symbols."""
    lib = _load()
    indexes = np.ascontiguousarray(indexes, np.int32)
    cdfs = np.ascontiguousarray(cdfs, np.uint32)
    cdf_sizes = np.ascontiguousarray(cdf_sizes, np.int32)
    offsets = np.ascontiguousarray(offsets, np.int32)
    buf = np.frombuffer(data, np.uint8)
    buf = np.ascontiguousarray(buf)
    n = indexes.size
    out = np.empty(n, np.int32)
    rc = lib.rans_decode_with_indexes(
        _as_ptr(buf, ctypes.c_uint8),
        buf.size,
        _as_ptr(indexes, ctypes.c_int32),
        n,
        _as_ptr(cdfs, ctypes.c_uint32),
        cdfs.shape[1],
        _as_ptr(cdf_sizes, ctypes.c_int32),
        _as_ptr(offsets, ctypes.c_int32),
        _as_ptr(out, ctypes.c_int32),
    )
    if rc != 0:
        raise RuntimeError("rans decode failed")
    return out


class StreamingDecoder:
    """Incremental decoder for autoregressive models: the CDF row of symbol
    k is only known after symbols < k are decoded, so decoding proceeds in
    caller-sized chunks (typically one latent pixel's channels at a time)."""

    def __init__(self, data: bytes, cdfs: np.ndarray, cdf_sizes, offsets):
        self._lib = _load()
        self.cdfs = np.ascontiguousarray(cdfs, np.uint32)
        self.cdf_sizes = np.ascontiguousarray(cdf_sizes, np.int32)
        self.offsets = np.ascontiguousarray(offsets, np.int32)
        buf = np.ascontiguousarray(np.frombuffer(data, np.uint8))
        self._handle = self._lib.rans_dec_create(
            _as_ptr(buf, ctypes.c_uint8), buf.size
        )

    def decode(self, indexes, cdfs=None, cdf_sizes=None, offsets=None) -> np.ndarray:
        """Decode len(indexes) symbols.  Optional per-call table overrides
        support models whose CDF rows are built on the fly (GMM context:
        a fresh row stack per wavefront, indexes = arange within it)."""
        indexes = np.ascontiguousarray(indexes, np.int32)
        if cdfs is None:
            cdfs, cdf_sizes, offsets = self.cdfs, self.cdf_sizes, self.offsets
        else:
            cdfs = np.ascontiguousarray(cdfs, np.uint32)
            cdf_sizes = np.ascontiguousarray(cdf_sizes, np.int32)
            offsets = np.ascontiguousarray(offsets, np.int32)
        out = np.empty(indexes.size, np.int32)
        rc = self._lib.rans_dec_decode(
            self._handle,
            _as_ptr(indexes, ctypes.c_int32),
            indexes.size,
            _as_ptr(cdfs, ctypes.c_uint32),
            cdfs.shape[1],
            _as_ptr(cdf_sizes, ctypes.c_int32),
            _as_ptr(offsets, ctypes.c_int32),
            _as_ptr(out, ctypes.c_int32),
        )
        if rc != 0:
            raise RuntimeError("rans streaming decode failed")
        return out

    def close(self):
        if self._handle:
            self._lib.rans_dec_free(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
