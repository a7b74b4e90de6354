"""Fused Pallas GDN vs the XLA reference math (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecompression_adversarial_tpu.models.layers import GDN
from imagecompression_adversarial_tpu.ops.pallas_gdn import gdn_fused


def _ref_gdn(x, gamma, beta, inverse):
    norm = jnp.einsum("...i,oi->...o", x * x, gamma) + beta
    return x * jnp.sqrt(norm) if inverse else x * jax.lax.rsqrt(norm)


def test_gdn_fused_forward_matches_reference():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 7, 8).astype(np.float32))
    gamma = jnp.asarray((0.1 * np.eye(8) + 0.01 * rng.rand(8, 8)).astype(np.float32))
    beta = jnp.asarray((1.0 + 0.1 * rng.rand(8)).astype(np.float32))

    for inverse in (False, True):
        out = gdn_fused(x, gamma, beta, inverse, True)  # interpret mode
        ref = _ref_gdn(x, gamma, beta, inverse)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_gdn_fused_gradients_match_reference():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 4, 5, 6).astype(np.float32))
    gamma = jnp.asarray((0.1 * np.eye(6) + 0.01 * rng.rand(6, 6)).astype(np.float32))
    beta = jnp.asarray((1.0 + 0.1 * rng.rand(6)).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 4, 5, 6).astype(np.float32))

    for inverse in (False, True):
        g_fused = jax.grad(
            lambda x, g, b: jnp.sum(w * gdn_fused(x, g, b, inverse, True)),
            argnums=(0, 1, 2),
        )(x, gamma, beta)
        g_ref = jax.grad(
            lambda x, g, b: jnp.sum(w * _ref_gdn(x, g, b, inverse)),
            argnums=(0, 1, 2),
        )(x, gamma, beta)
        for a, b_ in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)


def test_gdn_module_pallas_impl_matches_xla():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 16))
    xla_mod = GDN(impl="xla")
    params = xla_mod.init(jax.random.PRNGKey(1), x)["params"]
    out_xla = xla_mod.apply({"params": params}, x)
    out_pl = GDN(impl="pallas").apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               rtol=1e-5, atol=1e-6)


def test_gdn_fused_nondivisible_rows():
    # row count 2*3*5=30 does not divide the tile size: padding path
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 5, 4))
    gamma = 0.1 * jnp.eye(4)
    beta = jnp.ones(4)
    out = gdn_fused(x, gamma, beta, False, True)
    ref = _ref_gdn(x, gamma, beta, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)
