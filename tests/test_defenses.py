"""Defense tests: dihedral round-trip, ensemble selection, bitdepth, resize,
latent clamps."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecompression_adversarial_tpu.defenses import (
    anomaly_score,
    bitdepth_reduction,
    clamp_feature_with_p,
    clamp_value_naive,
    dihedral_forward,
    dihedral_inverse_group,
    make_defend_fn,
    random_resize,
    self_ensemble,
)
from imagecompression_adversarial_tpu.models import init_model, init_params


def test_dihedral_roundtrip_nonsquare():
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 8, 12, 3))
    flips, rots = dihedral_forward(x)
    assert flips.shape == (4, 8, 12, 3)
    assert rots.shape == (4, 12, 8, 3)
    # inverting the *transformed inputs* recovers the original in all 8 slots
    recon = dihedral_inverse_group(flips, rots)
    for k in range(8):
        np.testing.assert_allclose(np.asarray(recon[k]), np.asarray(x[0]), err_msg=str(k))


def test_dihedral_variants_are_distinct():
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 12, 3))
    flips, rots = dihedral_forward(x)
    all_flat = [np.asarray(v).ravel() for v in flips] + [
        np.asarray(v).ravel() for v in rots
    ]
    for i in range(8):
        for j in range(i + 1, 8):
            if all_flat[i].shape == all_flat[j].shape:
                assert not np.allclose(all_flat[i], all_flat[j]), (i, j)


def test_self_ensemble_runs_and_selects():
    module = init_model("factorized", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    apply_fn = lambda im, quant_mode: module.apply(
        {"params": params}, im, quant_mode=quant_mode
    )
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 96, 3))
    out = jax.jit(lambda x: self_ensemble(apply_fn, x))(x)
    assert out["x_hat"].shape == x.shape
    assert 0 <= int(out["best_idx"]) < 8
    assert np.isfinite(float(out["bpp"]))
    # winner's mse equals mse(x_hat, x) up to the [0,1] clamp
    assert float(out["best_mse"]) >= 0


def test_bitdepth_reduction():
    x = jnp.linspace(0, 1, 64).reshape(1, 8, 8, 1)
    r = bitdepth_reduction(x, bits=6)
    vals = np.unique(np.round(np.asarray(r) * 63, 6))
    assert np.allclose(vals, np.round(vals))  # all on the 6-bit lattice
    # gradient exists (ste)
    g = jax.grad(lambda v: jnp.sum(bitdepth_reduction(v)))(x)
    assert np.all(np.asarray(g) == 1.0)


def test_random_resize_shape_preserved():
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 96, 3))
    up, scale = random_resize(x)
    assert up.shape == x.shape
    assert 0 < scale <= 1
    # low-pass: output differs but is correlated
    assert float(jnp.mean((up - x) ** 2)) < 0.05


def test_clamp_value_naive():
    y = jnp.array([[-5.0, 0.0, 5.0]]).reshape(1, 1, 3, 1)
    out = clamp_value_naive(y, channel_max=[2.0], channel_min=[-2.0])
    np.testing.assert_allclose(np.asarray(out).ravel(), [-2.0, 0.0, 2.0])


def test_clamp_feature_with_p():
    y = jnp.full((1, 1, 1, 1), 100.0)
    means = jnp.zeros_like(y)
    scales = jnp.ones_like(y)
    out = clamp_feature_with_p(y, means, scales, epsilon=50.0)
    np.testing.assert_allclose(np.asarray(out), 50.0)


def test_anomaly_score():
    y = jnp.zeros((1, 2, 2, 1))
    assert float(anomaly_score(y, [1.0], [-1.0])) == 0.0
    y2 = jnp.full((1, 2, 2, 1), 3.0)
    assert float(anomaly_score(y2, [1.0], [-1.0])) == 2.0


def test_defend_fn_dispatch():
    module = init_model("factorized", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    apply_fn = lambda im, quant_mode: module.apply(
        {"params": params}, im, quant_mode=quant_mode
    )
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    for method in ("bitdepth", "resize", "ensemble"):
        x_hat, lik = make_defend_fn(apply_fn, method)(x)
        assert x_hat.shape == x.shape, method
    try:
        make_defend_fn(apply_fn, "bogus")
        assert False
    except ValueError:
        pass


def test_draw_resize_scale_host_side_and_jittable():
    from imagecompression_adversarial_tpu.defenses.self_ensemble import (
        draw_resize_scale,
    )

    s = draw_resize_scale(0)
    assert 0.5 <= s <= 0.75
    assert s == draw_resize_scale(0)  # deterministic per seed
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))
    up = jax.jit(lambda v: random_resize(v, scale=s)[0])(x)
    assert up.shape == x.shape


def test_self_ensemble_scan_matches_batch():
    """The sequential per-variant impl (the full-Kodak adaptive-attack
    footprint fix) must agree with the batched impl numerically."""
    module = init_model("factorized", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    apply_fn = lambda im, quant_mode: module.apply(
        {"params": params}, im, quant_mode=quant_mode
    )
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 96, 3))
    out_b = jax.jit(lambda x: self_ensemble(apply_fn, x, impl="batch"))(x)
    out_s = jax.jit(lambda x: self_ensemble(apply_fn, x, impl="scan"))(x)
    assert int(out_b["best_idx"]) == int(out_s["best_idx"])
    np.testing.assert_allclose(
        np.asarray(out_s["x_hat"]), np.asarray(out_b["x_hat"]), atol=1e-5
    )
    np.testing.assert_allclose(
        float(out_s["bpp"]), float(out_b["bpp"]), rtol=1e-5
    )

    # gradients flow through the scan impl on the quant-free path (what the
    # adaptive attack differentiates; 'dequantize' rounds -> zero grad)
    g = jax.grad(
        lambda x: jnp.sum(
            self_ensemble(apply_fn, x, quant_mode="none", impl="scan")["x_hat"]
        )
    )(x)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0

    import pytest

    with pytest.raises(ValueError, match="impl"):
        self_ensemble(apply_fn, x, impl="typo")


def test_adaptive_ensemble_scan_attack_runs():
    """defend_in_loop='ensemble' with the scan impl end-to-end (tiny)."""
    from imagecompression_adversarial_tpu.attacks import (
        RDAttackConfig,
        make_attack_fn,
    )

    module = init_model("factorized", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    cfg = RDAttackConfig(steps=3, defend_in_loop="ensemble", ensemble_impl="scan")
    res = make_attack_fn(module, cfg)(params, x)
    assert np.isfinite(float(res["vi"]))
