"""InvCompress codec tests: exact invertibility, forward smoke, attack."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecompression_adversarial_tpu.models import init_model, init_params
from imagecompression_adversarial_tpu.models.invcompress import (
    squeeze2,
    unsqueeze2,
)


def test_squeeze_roundtrip():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 12, 3))
    y = squeeze2(x)
    assert y.shape == (2, 4, 6, 12)
    np.testing.assert_allclose(np.asarray(unsqueeze2(y)), np.asarray(x))


def test_invcomp_is_exactly_invertible():
    module = init_model("invcompress", 1)
    params = init_params(module, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))

    y = module.apply({"params": params}, x, method=module.g_a)
    assert y.shape == (1, 4, 4, 768)  # /16, 768 channels
    x_rec = module.apply({"params": params}, y, method=module.g_s)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                               rtol=1e-4, atol=1e-4)


def test_invcompress_forward_and_attack():
    module = init_model("invcompress", 1)
    params = init_params(module, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 192, 192, 3))

    out = module.apply({"params": params}, x, quant_mode="dequantize")
    assert out["x_hat"].shape == x.shape
    for lik in out["likelihoods"].values():
        assert np.isfinite(np.asarray(lik)).all()

    from imagecompression_adversarial_tpu.attacks import (
        RDAttackConfig,
        make_attack_fn,
    )

    attack = make_attack_fn(module, RDAttackConfig(steps=3))
    res = attack(params, x)
    assert np.isfinite(float(res["vi"]))
