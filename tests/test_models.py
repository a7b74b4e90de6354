"""Codec forward smoke tests: shapes, likelihood sanity, quant-mode paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecompression_adversarial_tpu.models import (
    init_model,
    init_params,
    model_dims,
    quality_range,
)


@pytest.mark.parametrize(
    "name,quality",
    [("factorized", 1), ("hyper", 1), ("context", 1), ("cheng2020", 1), ("debug", 1)],
)
def test_forward_shapes(name, quality):
    module = init_model(name, quality)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 64, 64, 3))
    params = init_params(module, key, input_shape=(1, 64, 64, 3))

    out = module.apply(
        {"params": params}, x, quant_mode="noise", rngs={"quant": key}
    )
    assert out["x_hat"].shape == x.shape
    for lik in out["likelihoods"].values():
        arr = np.asarray(lik)
        assert np.isfinite(arr).all()
        assert (arr > 0).all() and (arr <= 1.0 + 1e-6).all()

    # deterministic eval path needs no rng
    out_eval = module.apply({"params": params}, x, quant_mode="dequantize")
    assert out_eval["x_hat"].shape == x.shape

    # attack path: quantization-free
    out_none = module.apply({"params": params}, x, quant_mode="none")
    assert out_none["x_hat"].shape == x.shape


@pytest.mark.parametrize("name", ["factorized", "hyper", "context", "cheng2020"])
def test_latent_downsampling_factor(name):
    module = init_model(name, 1)
    key = jax.random.PRNGKey(1)
    x = jnp.zeros((1, 64, 64, 3))
    params = init_params(module, key)
    y = module.apply({"params": params}, x, method=module.g_a)
    n, m = model_dims(name, 1)
    assert y.shape == (1, 4, 4, m)


def test_quality_ranges():
    assert quality_range("cheng2020") == (1, 6)
    assert quality_range("hyper") == (1, 8)
    with pytest.raises(ValueError):
        model_dims("cheng2020", 7)
    with pytest.raises(ValueError):
        init_model("nonexistent", 1)


def test_grad_flows_through_quant_free_path():
    """The attack differentiates MSE(g_s(g_a(x)), ref) wrt x — gradient must
    be finite and nonzero (ref `attack_rd.py:332-379`)."""
    module = init_model("hyper", 1)
    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(key, (1, 64, 64, 3))
    params = init_params(module, key)
    target = module.apply({"params": params}, x, quant_mode="dequantize")["x_hat"]

    def loss(xin):
        out = module.apply({"params": params}, xin, quant_mode="none")
        return jnp.mean((out["x_hat"] - target) ** 2)

    g = jax.grad(loss)(x + 0.01)
    arr = np.asarray(g)
    assert np.isfinite(arr).all()
    assert np.abs(arr).sum() > 0


def test_aux_loss_callable():
    module = init_model("factorized", 1)
    key = jax.random.PRNGKey(3)
    params = init_params(module, key)
    aux = module.apply({"params": params}, method=module.aux_loss)
    assert np.isfinite(float(aux))
