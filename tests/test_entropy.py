"""Entropy-model unit tests vs closed forms.

GaussianConditional has an exact closed form (Normal CDF differences); the
EntropyBottleneck is checked for probability-axioms (positive, sums to ~1
over the integer lattice) and for the quantile/aux-loss mechanics that the
reference's dedicated aux optimizer relies on (`/root/reference/coder.py:57-86`).
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from imagecompression_adversarial_tpu.entropy import (
    EntropyBottleneck,
    gaussian_conditional,
    gaussian_likelihood,
    default_scale_table,
)


def test_gaussian_likelihood_matches_normal_cdf():
    rng = np.random.RandomState(0)
    v = rng.randn(4, 5).astype(np.float32) * 3
    scales = np.abs(rng.randn(4, 5)).astype(np.float32) + 0.2
    means = rng.randn(4, 5).astype(np.float32)

    lik = gaussian_likelihood(jnp.array(v), jnp.array(scales), jnp.array(means))
    expected = stats.norm.cdf(v + 0.5, loc=means, scale=scales) - stats.norm.cdf(
        v - 0.5, loc=means, scale=scales
    )
    np.testing.assert_allclose(np.asarray(lik), expected, rtol=1e-4, atol=1e-6)


def test_gaussian_scale_floor():
    # scales below 0.11 are floored -> likelihood equals the floored one
    v = jnp.zeros((1, 1))
    lik_small = gaussian_likelihood(v, jnp.full((1, 1), 1e-4))
    lik_floor = gaussian_likelihood(v, jnp.full((1, 1), 0.11))
    np.testing.assert_allclose(lik_small, lik_floor)


def test_gaussian_scale_top_clamp():
    # scales above the real coder's table top (256) are clamped down, so the
    # ESTIMATE models the code the coder actually runs (gc_build_indexes maps
    # any scale > 256 to the last table row) — the −7% tic real-vs-est gap of
    # RESULTS.md round 3.  scale_max=None restores CompressAI forward
    # semantics (no top clamp).
    v = jnp.full((1, 1), 7.0)
    lik_big = gaussian_likelihood(v, jnp.full((1, 1), 500.0))
    lik_top = gaussian_likelihood(v, jnp.full((1, 1), 256.0))
    np.testing.assert_allclose(lik_big, lik_top)
    lik_unclamped = gaussian_likelihood(
        v, jnp.full((1, 1), 500.0), scale_max=None
    )
    assert float(lik_unclamped[0, 0]) < float(lik_top[0, 0])


def test_gaussian_conditional_round_trip():
    key = jax.random.PRNGKey(0)
    y = jax.random.normal(key, (2, 4, 4, 3)) * 5
    scales = jnp.ones_like(y)
    means = jnp.zeros_like(y)
    y_hat, lik = gaussian_conditional(y, scales, means, quant_mode="dequantize")
    np.testing.assert_allclose(y_hat, jnp.round(y))
    assert (lik > 0).all() and (lik <= 1).all()


def test_scale_table():
    t = default_scale_table()
    assert t.shape == (64,)
    np.testing.assert_allclose(t[0], 0.11, rtol=1e-5)
    np.testing.assert_allclose(t[-1], 256.0, rtol=1e-5)


class TestEntropyBottleneck:
    def setup_method(self):
        self.eb = EntropyBottleneck(channels=4)
        key = jax.random.PRNGKey(0)
        z = jnp.zeros((1, 2, 2, 4))
        self.variables = self.eb.init({"params": key, "quant": key}, z)

    def test_likelihood_is_valid_pmf(self):
        # evaluate P(v) on the integer lattice; must be positive and sum ~1
        grid = jnp.arange(-200, 201, dtype=jnp.float32)
        z = jnp.tile(grid.reshape(1, -1, 1, 1), (1, 1, 1, 4))
        _, lik = self.eb.apply(self.variables, z, quant_mode="dequantize")
        lik = np.asarray(lik)
        assert (lik > 0).all()
        totals = lik.sum(axis=(0, 1, 2))
        np.testing.assert_allclose(totals, 1.0, atol=0.02)

    def test_noise_mode_needs_key(self):
        z = jnp.zeros((1, 2, 2, 4))
        out, lik = self.eb.apply(
            self.variables, z, quant_mode="noise", rngs={"quant": jax.random.PRNGKey(3)}
        )
        assert jnp.max(jnp.abs(out - z)) <= 0.5
        assert lik.shape == z.shape

    def test_dequantize_centers_on_medians(self):
        params = self.variables["params"]
        medians = params["quantiles"][:, 0, 1]
        z = jnp.tile(medians.reshape(1, 1, 1, -1), (1, 2, 2, 1)) + 0.3
        z_hat, _ = self.eb.apply(self.variables, z, quant_mode="dequantize")
        # round(z - median) + median == median + 0 (0.3 rounds to 0)
        np.testing.assert_allclose(
            np.asarray(z_hat), np.tile(medians.reshape(1, 1, 1, -1), (1, 2, 2, 1)),
            rtol=1e-5, atol=1e-6,
        )

    def test_aux_loss_decreases_quantiles_only(self):
        def loss(params):
            return self.eb.apply({"params": params}, method=self.eb.aux_loss)

        g = jax.grad(loss)(self.variables["params"])
        # only the quantiles parameter receives gradient (stop_gradient on the
        # rest, matching the reference optimizer split)
        assert np.abs(np.asarray(g["quantiles"])).sum() > 0
        for name, val in g.items():
            if name != "quantiles":
                np.testing.assert_allclose(np.asarray(val), 0.0)

    def test_likelihood_gradient_flows_to_input(self):
        def neg_log_lik(z):
            _, lik = self.eb.apply(self.variables, z, quant_mode="none")
            return -jnp.sum(jnp.log(lik))

        z = jnp.full((1, 2, 2, 4), 1.3)
        g = jax.grad(neg_log_lik)(z)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0
