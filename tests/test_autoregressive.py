"""Autoregressive real-coder tests: encoder/decoder consistency."""

import jax
import numpy as np
import pytest

from imagecompression_adversarial_tpu.entropy.autoregressive import (
    ARWeights,
    ar_decode,
    ar_encode,
)
from imagecompression_adversarial_tpu.entropy.tables import (
    build_gc_tables,
    gc_build_indexes,
)
from imagecompression_adversarial_tpu.models import init_model, init_params


def _encoder_side_y_hat(y, hyper_params, weights):
    """Replicate the encoder's sequential reconstruction."""
    h, w, m = y.shape
    y_hat = np.zeros((h + 4, w + 4, m), np.float32)
    for i in range(h):
        for j in range(w):
            scales, means = weights.gaussian_params(
                y_hat[i : i + 5, j : j + 5], hyper_params[i, j]
            )
            sym = np.round(y[i, j] - means).astype(np.int32)
            y_hat[i + 2, j + 2] = sym + means
    return y_hat[2 : 2 + h, 2 : 2 + w]


def test_ar_roundtrip_reproduces_encoder_state():
    module = init_model("context", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    weights = ARWeights(params)
    gc_tables = build_gc_tables()

    rng = np.random.RandomState(0)
    h, w, m = 6, 7, weights.m
    y = (rng.randn(h, w, m) * 3).astype(np.float32)
    hyper = (rng.randn(h, w, 2 * m) * 0.5).astype(np.float32)

    string = ar_encode(y, hyper, weights, gc_tables)
    assert len(string) > 0
    decoded = ar_decode(string, hyper, weights, gc_tables)

    expected = _encoder_side_y_hat(y, hyper, weights)
    np.testing.assert_allclose(decoded, expected, rtol=1e-5, atol=1e-5)
    # quantization error bounded by half a bin
    assert np.abs(decoded - y).max() <= 0.5 + 1e-5


def test_ar_mask_is_strictly_causal():
    module = init_model("context", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    weights = ARWeights(params)
    # center and raster-future taps must be zeroed
    k = weights.ctx_kernel
    assert np.all(k[2, 2:] == 0)
    assert np.all(k[3:] == 0)
    assert np.abs(k[2, :2]).sum() > 0  # causal taps survive


def test_realcodec_context_roundtrip():
    from imagecompression_adversarial_tpu.entropy.codec import RealCodec

    module = init_model("context", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    codec = RealCodec(module, params)
    x = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)), np.float32
    )
    out = codec.compress(x)
    assert len(out["strings"]) == 2
    x_hat = codec.decompress(out["strings"], out["shape"])
    assert x_hat.shape == x.shape
    assert np.isfinite(x_hat).all()
