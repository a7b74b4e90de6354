"""NLAIC codec tests: non-local attention globality + forward/attack."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecompression_adversarial_tpu.models import init_model, init_params
from imagecompression_adversarial_tpu.models.nlaic import NonLocalBlock


def test_nonlocal_block_is_global():
    """A single-pixel perturbation must influence every output position
    (unlike conv locality)."""
    blk = NonLocalBlock(8)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 6, 6, 8))
    params = blk.init(jax.random.PRNGKey(1), x)["params"]
    base = blk.apply({"params": params}, x)
    x2 = x.at[0, 0, 0, :].add(3.0)
    out = blk.apply({"params": params}, x2)
    diff = np.abs(np.asarray(out - base)).sum(-1)[0]
    assert (diff > 0).mean() > 0.9  # nearly every position moved


def test_nlaic_forward_and_attack():
    module = init_model("nlaic", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 192, 192, 3))
    out = module.apply({"params": params}, x, quant_mode="dequantize")
    assert out["x_hat"].shape == x.shape
    for lik in out["likelihoods"].values():
        assert np.isfinite(np.asarray(lik)).all()

    from imagecompression_adversarial_tpu.attacks import (
        RDAttackConfig,
        make_attack_fn,
    )

    res = make_attack_fn(module, RDAttackConfig(steps=3))(params, x)
    assert np.isfinite(float(res["vi"]))
