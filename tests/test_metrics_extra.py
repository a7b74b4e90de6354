"""FID/KID/IS math, compare suite, and layer-introspection tests."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecompression_adversarial_tpu.metrics.compare import compare_pair
from imagecompression_adversarial_tpu.metrics.fid import (
    frechet_distance,
    inception_score,
    kid,
    make_conv_feature_fn,
)
from imagecompression_adversarial_tpu.models import init_model, init_params
from imagecompression_adversarial_tpu.utils.introspect import (
    channel_maxima,
    layer_activations,
    layer_compare,
)


def test_frechet_distance_identical_is_zero():
    rng = np.random.RandomState(0)
    a = rng.randn(500, 8)
    assert abs(frechet_distance(a, a)) < 1e-6


def test_frechet_distance_mean_shift():
    rng = np.random.RandomState(1)
    a = rng.randn(2000, 4)
    b = rng.randn(2000, 4) + 2.0
    # FID ~ ||mu diff||^2 = 4 * 4 = 16 for identity covariances
    d = frechet_distance(a, b)
    assert 13.0 < d < 19.0


def test_kid_zero_for_same_distribution():
    rng = np.random.RandomState(2)
    a = rng.randn(400, 8)
    b = rng.randn(400, 8)
    mean_same, _ = kid(a, b)
    mean_diff, _ = kid(a, b + 3.0)
    assert abs(mean_same) < 0.1
    assert mean_diff > mean_same + 1.0


def test_inception_score_bounds():
    # uniform probs -> IS == 1; one-hot spread over classes -> IS == K
    uniform = np.full((100, 10), 0.1)
    is_u, _ = inception_score(uniform)
    assert abs(is_u - 1.0) < 1e-5
    onehot = np.eye(10)[np.arange(100) % 10] * 0.999 + 1e-4
    is_o, _ = inception_score(onehot)
    assert is_o > 5.0


def test_conv_feature_fn():
    fn = make_conv_feature_fn(dim=32)
    x = np.random.RandomState(0).rand(3, 64, 64, 3).astype(np.float32)
    f = fn(x)
    assert f.shape == (3, 32)
    assert np.isfinite(f).all()


def test_compare_pair():
    a = np.random.RandomState(0).rand(1, 192, 192, 3).astype(np.float32)
    m = compare_pair(a, a)
    assert m["psnr"] == np.inf or m["psnr"] > 100
    b = np.clip(a + 0.05, 0, 1)
    m2 = compare_pair(a, b)
    assert 20 < m2["psnr"] < 35


def test_layer_activations_and_compare():
    module = init_model("factorized", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    acts = layer_activations(module, params, x)
    assert any("g_a_0" in k for k in acts)
    assert any("g_s_6" in k for k in acts)

    rows = layer_compare(module, params, x, x + 0.01)
    assert len(rows) > 5
    for path, err, rel in rows:
        assert np.isfinite(err) and err >= 0
    # error at the first layer is nonzero
    first_err = [e for p, e, _ in rows if "g_a_0" in p]
    assert first_err and first_err[0] > 0


def test_channel_maxima():
    y = jnp.zeros((1, 4, 4, 3)).at[0, 1, 1, 2].set(-7.0)
    m = channel_maxima(y)
    np.testing.assert_allclose(m, [0.0, 0.0, 7.0])


def test_vi_guards_no_op_attack_finite():
    """A no-op attack (identical in/out) must return finite VI metrics
    (ref guards: self_ensemble.py:238-243)."""
    import jax.numpy as jnp
    from imagecompression_adversarial_tpu.metrics import vi, vi_msim

    z = jnp.float32(0.0)
    one = jnp.float32(1.0)
    assert float(vi(z, z)) == 0.0
    assert float(vi_msim(one, one)) == 0.0
    # one-sided degenerate cases stay finite too
    import numpy as np

    assert np.isfinite(float(vi(z, jnp.float32(1e-4))))
    assert np.isfinite(float(vi(jnp.float32(1e-4), z)))
    assert np.isfinite(float(vi_msim(jnp.float32(0.5), one)))
    # and jit-compatible
    import jax

    assert np.isfinite(float(jax.jit(vi)(z, z)))
