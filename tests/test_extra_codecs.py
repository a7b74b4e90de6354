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


def test_fic_forward_and_attack():
    module = init_model("fic", 1)
    params = init_params(module, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out = module.apply({"params": params}, x, quant_mode="dequantize")
    assert out["x_hat"].shape == x.shape
    for lik in out["likelihoods"].values():
        assert np.isfinite(np.asarray(lik)).all()
    # fic decodes the UN-quantized latent (ref attack_fic.py:50,121)
    y = out["y"]
    x_direct = module.apply({"params": params}, y, method="g_s")
    np.testing.assert_allclose(
        np.asarray(out["x_hat"]), np.asarray(x_direct), atol=1e-6
    )
    # two-output encoder decomposition (ref :42)
    y2, z2 = module.apply({"params": params}, x, method="encoder")
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-6)

    from imagecompression_adversarial_tpu.attacks import (
        RDAttackConfig,
        make_attack_fn,
    )

    res = make_attack_fn(module, RDAttackConfig(steps=3))(params, x)
    assert np.isfinite(float(res["vi"]))


def test_fic_context4_causality():
    """Phase-k entropy params must not depend on phase >= k latents: decode
    order (0,0) -> (1,1) -> (0,1) -> (1,0) over the 2x2 checkerboard."""
    from imagecompression_adversarial_tpu.models.fic import Context4

    ctx = Context4(M=4, hidden=8)
    y = jnp.zeros((1, 8, 8, 4))
    feats = jnp.zeros((1, 8, 8, 8))
    params = ctx.init(jax.random.PRNGKey(0), y, feats)["params"]
    s0, m0 = ctx.apply({"params": params}, y, feats)
    # perturb a LAST-phase pixel (odd row, even col = phase (1,0), index 3):
    # NOTHING may change — same-phase pixels are coded in parallel and no
    # other phase conditions on the last one
    y2 = y.at[0, 1, 0, :].set(7.0)
    s1, m1 = ctx.apply({"params": params}, y2, feats)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1))
    np.testing.assert_allclose(np.asarray(m0), np.asarray(m1))
    # perturb a FIRST-phase pixel (even, even): later phases DO see it
    # (context live), but phase (0,0) itself must stay hyper-only
    y3 = y.at[0, 0, 0, :].set(7.0)
    s2, _ = ctx.apply({"params": params}, y3, feats)
    np.testing.assert_allclose(
        np.asarray(s0[0, 0::2, 0::2]), np.asarray(s2[0, 0::2, 0::2])
    )
    assert not np.allclose(np.asarray(s0[0, 1::2, 1::2]), np.asarray(s2[0, 1::2, 1::2]))


def test_fic_first_phase_is_hyper_only():
    """Phase (0,0) conditions only on hyper features — with zero hyper
    features and any latent, its params equal the zero-latent params."""
    from imagecompression_adversarial_tpu.models.fic import Context4

    ctx = Context4(M=4, hidden=8)
    feats = jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 8, 8))
    y_zero = jnp.zeros((1, 8, 8, 4))
    ya = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    params = ctx.init(jax.random.PRNGKey(0), y_zero, feats)["params"]
    sa, _ = ctx.apply({"params": params}, ya, feats)
    sz, _ = ctx.apply({"params": params}, y_zero, feats)
    np.testing.assert_allclose(
        np.asarray(sa[0, 0::2, 0::2]), np.asarray(sz[0, 0::2, 0::2]), atol=1e-6
    )
