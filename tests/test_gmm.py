"""Gaussian-mixture entropy model tests."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from imagecompression_adversarial_tpu.entropy.gaussian import (
    gaussian_likelihood,
    gaussian_mixture_likelihood,
)
from imagecompression_adversarial_tpu.models import init_model, init_params


def test_gmm_reduces_to_single_gaussian():
    v = jnp.asarray(np.random.RandomState(0).randn(3, 4).astype(np.float32) * 2)
    scales = jnp.full(v.shape + (1,), 0.7)
    means = jnp.full(v.shape + (1,), 0.1)
    logits = jnp.zeros(v.shape + (1,))
    gmm = gaussian_mixture_likelihood(v, scales, means, logits)
    single = gaussian_likelihood(v, scales[..., 0], means[..., 0])
    np.testing.assert_allclose(np.asarray(gmm), np.asarray(single),
                               rtol=1e-5, atol=1e-7)


def test_gmm_matches_closed_form_mixture():
    v = jnp.asarray([[0.0, 1.0, -2.0]])
    scales = jnp.asarray([[[0.5, 2.0]] * 3]).reshape(1, 3, 2)
    means = jnp.asarray([[[-1.0, 1.0]] * 3]).reshape(1, 3, 2)
    logits = jnp.asarray([[[0.3, -0.2]] * 3]).reshape(1, 3, 2)
    out = np.asarray(gaussian_mixture_likelihood(v, scales, means, logits))

    w = np.exp([0.3, -0.2])
    w = w / w.sum()
    for j, val in enumerate([0.0, 1.0, -2.0]):
        expected = 0.0
        for k in range(2):
            s, m = [0.5, 2.0][k], [-1.0, 1.0][k]
            expected += w[k] * (
                stats.norm.cdf(val + 0.5, m, s) - stats.norm.cdf(val - 0.5, m, s)
            )
        np.testing.assert_allclose(out[0, j], expected, rtol=1e-4)


def test_cheng_gmm_codec_forward_and_attack():
    module = init_model("cheng2020-gmm", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 192, 192, 3))
    out = module.apply({"params": params}, x, quant_mode="dequantize")
    assert out["x_hat"].shape == x.shape
    lik = np.asarray(out["likelihoods"]["y"])
    assert np.isfinite(lik).all() and (lik > 0).all()

    from imagecompression_adversarial_tpu.attacks import (
        RDAttackConfig,
        make_attack_fn,
    )

    res = make_attack_fn(module, RDAttackConfig(steps=3))(params, x)
    assert np.isfinite(float(res["vi"]))
