"""rANS coder + CDF table + real codec round-trip tests."""

import numpy as np
import pytest

from imagecompression_adversarial_tpu.entropy import rans
from imagecompression_adversarial_tpu.entropy.tables import (
    build_eb_tables,
    build_gc_tables,
    gc_build_indexes,
    pmf_to_quantized_cdf,
)


def test_pmf_to_quantized_cdf_properties():
    pmf = np.array([0.5, 0.3, 0.15])
    cdf = pmf_to_quantized_cdf(pmf, 0.05)
    assert cdf[0] == 0
    assert cdf[-1] == 1 << 16
    assert (np.diff(cdf) >= 1).all()  # every slot coded, incl. escape
    assert len(cdf) == len(pmf) + 2


def test_rans_roundtrip_uniformish():
    rng = np.random.RandomState(0)
    pmf = np.array([0.2, 0.3, 0.25, 0.15, 0.05])
    cdf = pmf_to_quantized_cdf(pmf, 0.05)
    cdfs = cdf[None, :]
    sizes = np.array([len(cdf) - 1], np.int32)
    offsets = np.array([0], np.int32)

    symbols = rng.choice(5, size=5000, p=pmf / pmf.sum()).astype(np.int32)
    indexes = np.zeros(5000, np.int32)
    s = rans.encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
    decoded = rans.decode_with_indexes(s, indexes, cdfs, sizes, offsets)
    np.testing.assert_array_equal(decoded, symbols)
    # rate close to the source entropy H ~ 2.13 bits/sym
    bits = len(s) * 8 / 5000
    entropy = -np.sum(pmf / pmf.sum() * np.log2(pmf / pmf.sum()))
    assert bits < entropy + 0.15


def test_rans_roundtrip_with_overflow_and_offsets():
    pmf = np.array([0.45, 0.45])
    cdf = pmf_to_quantized_cdf(pmf, 0.1)
    cdfs = cdf[None, :]
    sizes = np.array([len(cdf) - 1], np.int32)
    offsets = np.array([-3], np.int32)

    # values wildly outside the alphabet exercise escape + bypass coding
    symbols = np.array([-3, -2, 47, -40, 5, -3, 200, -3], np.int32)
    indexes = np.zeros(len(symbols), np.int32)
    s = rans.encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
    decoded = rans.decode_with_indexes(s, indexes, cdfs, sizes, offsets)
    np.testing.assert_array_equal(decoded, symbols)


def test_rans_multi_row():
    rng = np.random.RandomState(1)
    rows, sizes, offs = [], [], []
    for k in range(4):
        pmf = rng.dirichlet(np.ones(6 + k))
        rows.append(pmf_to_quantized_cdf(pmf, 1e-3))
        sizes.append(len(rows[-1]) - 1)
        offs.append(-k)
    stride = max(len(r) for r in rows)
    cdfs = np.zeros((4, stride), np.uint32)
    for i, r in enumerate(rows):
        cdfs[i, : len(r)] = r
        cdfs[i, len(r):] = r[-1]
    sizes = np.asarray(sizes, np.int32)
    offs = np.asarray(offs, np.int32)

    indexes = rng.randint(0, 4, 2000).astype(np.int32)
    symbols = np.array(
        [rng.randint(0, sizes[i] - 1) + offs[i] for i in indexes], np.int32
    )
    s = rans.encode_with_indexes(symbols, indexes, cdfs, sizes, offs)
    decoded = rans.decode_with_indexes(s, indexes, cdfs, sizes, offs)
    np.testing.assert_array_equal(decoded, symbols)


def test_gc_tables_and_indexes():
    t = build_gc_tables()
    assert t["cdfs"].shape[0] == 64
    # monotone rows summing to 2^16
    for i in range(0, 64, 16):
        row = t["cdfs"][i][: t["cdf_sizes"][i] + 1]
        assert row[0] == 0 and row[-1] == 1 << 16
    idx = gc_build_indexes(np.array([0.05, 0.11, 1.0, 300.0]), t["scale_table"])
    assert idx[0] == idx[1] <= 1  # floored at the smallest scale (fp rounding)
    assert idx[-1] == 63
    assert (np.diff(idx) >= 0).all()  # monotone in scale


class TestRealCodec:
    @pytest.mark.parametrize("arch", ["factorized", "hyper"])
    def test_roundtrip(self, arch):
        import jax

        from imagecompression_adversarial_tpu.entropy.codec import RealCodec
        from imagecompression_adversarial_tpu.models import init_model, init_params

        module = init_model(arch, 1)
        params = init_params(module, jax.random.PRNGKey(0))
        codec = RealCodec(module, params)

        key = jax.random.PRNGKey(1)
        x = np.asarray(jax.random.uniform(key, (1, 64, 64, 3)), np.float32)
        out = codec.compress(x)
        assert all(isinstance(s, bytes) and len(s) > 0 for s in out["strings"])
        x_hat = codec.decompress(out["strings"], out["shape"])
        assert x_hat.shape == x.shape

        # decode must be IDENTICAL to the round-quantized forward pass
        import jax.numpy as jnp

        ref = module.apply({"params": params}, jnp.asarray(x),
                           quant_mode="dequantize")
        np.testing.assert_allclose(
            x_hat, np.clip(np.asarray(ref["x_hat"]), 0, 1), atol=1e-5
        )

    def test_table_bpp_brackets_real(self):
        # table_bpp is the entropy floor of the wire format: real_bpp must
        # sit slightly ABOVE it (rANS/stream overhead only), and the model's
        # forward estimate must now be near it (the gaussian_likelihood top
        # clamp mirrors gc_build_indexes; residual gap = table rounding-up).
        import jax
        import jax.numpy as jnp

        from imagecompression_adversarial_tpu.entropy.codec import RealCodec
        from imagecompression_adversarial_tpu.metrics import bpp_from_likelihoods
        from imagecompression_adversarial_tpu.models import init_model, init_params

        module = init_model("hyper", 1)
        params = init_params(module, jax.random.PRNGKey(0))
        codec = RealCodec(module, params)
        x = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)), np.float32
        )
        num_pixels = 64 * 64
        out = codec.compress(x)
        real = codec.real_bpp(out, num_pixels)
        table = codec.table_bpp(x, num_pixels)
        assert table is not None
        # near-floor: rANS integer arithmetic can dip ~1% below the model
        # sum per-realization (tables.ideal_bits docstring)
        assert real >= table * 0.98 - 1e-6
        assert real - table < 0.08  # rANS/flush overhead, not structural
        ref = module.apply({"params": params}, jnp.asarray(x),
                           quant_mode="dequantize")
        est = float(bpp_from_likelihoods(ref["likelihoods"], num_pixels))
        # On RANDOM weights many symbols overflow the table support, so the
        # Gaussian estimate and the escape+bypass wire cost diverge (here
        # ~20%); tight est~table agreement is a trained-model property
        # (verified on-chip: gmm +0.34%, RESULTS.md).  Keep a sanity band.
        assert abs(est - table) / max(table, 1e-6) < 0.5

    def test_unsupported_module_rejected(self):
        from imagecompression_adversarial_tpu.entropy.codec import RealCodec

        class NotACodec:
            pass

        with pytest.raises((NotImplementedError, KeyError, TypeError)):
            RealCodec(NotACodec(), {"entropy_bottleneck": {}})


class TestMeanScaleRealCodec:
    def test_tic_roundtrip(self):
        import jax
        import jax.numpy as jnp

        from imagecompression_adversarial_tpu.entropy.codec import RealCodec
        from imagecompression_adversarial_tpu.models import init_model, init_params

        module = init_model("tic", 1)
        params = init_params(module, jax.random.PRNGKey(0))
        codec = RealCodec(module, params)
        x = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)), np.float32
        )
        out = codec.compress(x)
        x_hat = codec.decompress(out["strings"], out["shape"])
        ref = module.apply({"params": params}, jnp.asarray(x),
                           quant_mode="dequantize")
        np.testing.assert_allclose(
            x_hat, np.clip(np.asarray(ref["x_hat"]), 0, 1), atol=1e-4
        )
