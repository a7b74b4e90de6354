"""Unit tests for bound-STEs and quantizers vs closed-form gradient gating.

The gating semantics under test are the reference's
(`/root/reference/utils/ops.py:28-56`): gradients pass through a clipped
value when it is inside the bound OR when the gradient points back inside.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecompression_adversarial_tpu.ops import (
    bound_clip,
    lower_bound,
    ste_round,
    universal_quant,
    upper_bound,
    quantize,
)


def test_lower_bound_forward():
    x = jnp.array([-2.0, 0.5, 3.0])
    np.testing.assert_allclose(lower_bound(x, 0.0), [0.0, 0.5, 3.0])


def test_lower_bound_gradient_gating():
    # d/dx sum(w * lower_bound(x, 0)) with chosen w signs exercises the gate.
    x = jnp.array([-1.0, -1.0, 2.0, 2.0])
    w = jnp.array([1.0, -1.0, 1.0, -1.0])
    g = jax.grad(lambda v: jnp.sum(w * lower_bound(v, 0.0)))(x)
    # below bound: only negative upstream grad passes (pulls x up)
    # above bound: everything passes
    np.testing.assert_allclose(g, [0.0, -1.0, 1.0, -1.0])


def test_upper_bound_gradient_gating():
    x = jnp.array([2.0, 2.0, -1.0, -1.0])
    w = jnp.array([1.0, -1.0, 1.0, -1.0])
    g = jax.grad(lambda v: jnp.sum(w * upper_bound(v, 1.0)))(x)
    # above bound: only positive upstream grad passes (pushes x down)
    np.testing.assert_allclose(g, [1.0, 0.0, 1.0, -1.0])


def test_bound_clip_matches_composition():
    x = jnp.linspace(-2, 2, 9)
    np.testing.assert_allclose(bound_clip(x, 0.0, 1.0), jnp.clip(x, 0.0, 1.0))


def test_ste_round():
    x = jnp.array([0.4, 0.6, -1.2])
    np.testing.assert_allclose(ste_round(x), [0.0, 1.0, -1.0])
    g = jax.grad(lambda v: jnp.sum(ste_round(v) * 2.0))(x)
    np.testing.assert_allclose(g, [2.0, 2.0, 2.0])


def test_universal_quant_identity_gradient():
    key = jax.random.PRNGKey(0)
    x = jnp.linspace(-3, 3, 16)
    y = universal_quant(x, key)
    # |x - uq(x)| <= 1 and gradient is identity
    assert jnp.max(jnp.abs(y - x)) <= 1.0
    g = jax.grad(lambda v: jnp.sum(universal_quant(v, key)))(x)
    np.testing.assert_allclose(g, jnp.ones_like(x))


def test_quantize_modes():
    key = jax.random.PRNGKey(1)
    y = jnp.array([[0.3, 1.7], [-0.6, 2.2]])
    means = jnp.array([[0.1, 0.1], [0.1, 0.1]])
    assert (quantize(y, "none") == y).all()
    np.testing.assert_allclose(quantize(y, "dequantize"), jnp.round(y))
    np.testing.assert_allclose(
        quantize(y, "dequantize", means=means), jnp.round(y - means) + means
    )
    noisy = quantize(y, "noise", key=key)
    assert jnp.max(jnp.abs(noisy - y)) <= 0.5
    with pytest.raises(ValueError):
        quantize(y, "bogus")
    with pytest.raises(ValueError):
        quantize(y, "noise")  # no key
