"""cheng2020-attn and TIC transformer codec tests."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecompression_adversarial_tpu.models import init_model, init_params
from imagecompression_adversarial_tpu.models.tic import (
    window_merge,
    window_partition,
)


def test_window_partition_roundtrip():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 12, 5))
    wins = window_partition(x, 4)
    assert wins.shape == (2 * 2 * 3, 16, 5)
    back = window_merge(wins, 4, 2, 8, 12)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_cheng_attn_forward_and_attack():
    module = init_model("cheng2020-attn", 1)
    params = init_params(module, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out = module.apply({"params": params}, x, quant_mode="dequantize")
    assert out["x_hat"].shape == x.shape
    # attention params exist
    assert "g_a_attn_1" in params and "g_s_attn_0" in params


def test_tic_forward_and_attack():
    module = init_model("tic", 1)
    params = init_params(module, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 192, 192, 3))
    out = module.apply({"params": params}, x, quant_mode="dequantize")
    assert out["x_hat"].shape == x.shape
    assert out["y"].shape == (1, 12, 12, 192)
    for lik in out["likelihoods"].values():
        assert np.isfinite(np.asarray(lik)).all()

    from imagecompression_adversarial_tpu.attacks import (
        RDAttackConfig,
        make_attack_fn,
    )

    res = make_attack_fn(module, RDAttackConfig(steps=3))(params, x)
    assert np.isfinite(float(res["vi"]))


def test_tic_attention_is_window_local():
    """A perturbation inside one attention window of a single block must not
    leak outside its window (locality sanity for the non-shifted block)."""
    from imagecompression_adversarial_tpu.models.tic import SwinBlock

    blk = SwinBlock(dim=8, num_heads=2, window=4, shift=False)
    x = jnp.zeros((1, 8, 8, 8))
    params = blk.init(jax.random.PRNGKey(0), x)["params"]
    base = blk.apply({"params": params}, x)
    x2 = x.at[0, 1, 1, :].set(5.0)
    out = blk.apply({"params": params}, x2)
    diff = np.abs(np.asarray(out - base)).sum(axis=-1)[0]
    assert diff[:4, :4].sum() > 0  # inside the (0,0) window
    assert diff[4:, :].sum() == 0 and diff[:, 4:].sum() == 0  # not outside
