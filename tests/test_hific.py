"""HiFiC GAN codec tests: shapes, attack compatibility, GAN step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from imagecompression_adversarial_tpu.models import init_model, init_params
from imagecompression_adversarial_tpu.models.hific import (
    ChannelNorm,
    HiFiCDiscriminator,
)
from imagecompression_adversarial_tpu.train.gan import (
    hific_generator_loss,
    make_gan_train_step,
    non_saturating_d_loss,
    non_saturating_g_loss,
)


def test_channel_norm():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 8)) * 5 + 3
    mod = ChannelNorm()
    params = mod.init(jax.random.PRNGKey(1), x)["params"]
    out = mod.apply({"params": params}, x)
    # normalized over channels at init (gamma=1, beta=0)
    np.testing.assert_allclose(np.asarray(jnp.mean(out, -1)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.var(out, -1)), 1.0, atol=0.05)


def test_hific_forward_and_attack():
    module = init_model("hific", 1)
    params = init_params(module, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 192, 192, 3))

    out = module.apply({"params": params}, x, quant_mode="dequantize")
    assert out["x_hat"].shape == x.shape
    assert out["y"].shape == (1, 12, 12, 220)

    from imagecompression_adversarial_tpu.attacks import (
        RDAttackConfig,
        make_attack_fn,
    )

    res = make_attack_fn(module, RDAttackConfig(steps=3))(params, x)
    assert np.isfinite(float(res["vi"]))


def test_gan_losses():
    logits = jnp.zeros((2, 4, 4, 1))
    g = float(non_saturating_g_loss(logits))
    d = float(non_saturating_d_loss(logits, logits))
    assert abs(g - np.log(2)) < 1e-5
    assert abs(d - 2 * np.log(2)) < 1e-5


def test_gan_train_step_runs():
    codec = init_model("hific", 1)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    g_params = init_params(codec, jax.random.PRNGKey(1), input_shape=(1, 64, 64, 3))

    disc = HiFiCDiscriminator()
    y_dummy = jnp.zeros((1, 4, 4, 220))
    d_vars = disc.init(jax.random.PRNGKey(2), x, y_dummy, train=False)
    d_params = d_vars["params"]
    d_stats = d_vars.get("batch_stats", {})

    g_opt = optax.adam(1e-4)
    d_opt = optax.adam(1e-4)
    step = jax.jit(make_gan_train_step(codec, disc, g_opt, d_opt))
    out = step(
        g_params, d_params, d_stats, g_opt.init(g_params), d_opt.init(d_params),
        x, jax.random.PRNGKey(3),
    )
    g_params2, d_params2, _, _, _, logs = out
    for k in ("loss", "bpp", "mse", "perceptual", "g_adv", "d_loss"):
        assert np.isfinite(float(logs[k])), k
    # both players moved
    diff_g = jax.tree_util.tree_reduce(
        lambda a, leaf: a + float(jnp.abs(leaf).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, g_params, g_params2), 0.0)
    assert diff_g > 0
