"""Analysis suite tests: feature profiling, noise eval, recompression,
transfer, detection, distribution."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecompression_adversarial_tpu.analysis import (
    calibrated_blur,
    channel_rates,
    gaussian_blur,
    latent_histogram,
    make_detect_fn,
    make_noise_eval_fn,
    make_recompression_fn,
    make_transfer_eval_fn,
    predicted_distribution,
    profile_latents,
    rate_inflation_ranking,
    search_corpus,
)
from imagecompression_adversarial_tpu.models import init_model, init_params


def _setup(name="factorized"):
    module = init_model(name, 1)
    params = init_params(module, jax.random.PRNGKey(0))
    return module, params


def test_profile_latents_topk_boundary():
    g_a = lambda x: x  # identity "encoder" makes the boundary math exact
    images = [np.full((1, 2, 2, 3), v, np.float32) for v in range(10)]
    profile = profile_latents(g_a, images, k=3)
    # 3rd largest max per channel is 7; 3rd smallest min is 2
    np.testing.assert_allclose(profile["channel_max"], [7, 7, 7])
    np.testing.assert_allclose(profile["channel_min"], [2, 2, 2])


def test_noise_eval():
    module, params = _setup()
    fn = make_noise_eval_fn(module)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 192, 192, 3))
    res = fn(params, x, jax.random.PRNGKey(2), 1e-4)
    for k in ("vi_noise", "bpp", "bpp_ori", "psnr"):
        assert np.isfinite(float(res[k])), k


def test_gaussian_blur_and_calibration():
    x = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3)), np.float32
    )
    blurred = gaussian_blur(jnp.asarray(x), 2.0)
    assert blurred.shape == x.shape
    # blur reduces variance
    assert float(jnp.var(blurred)) < float(jnp.var(jnp.asarray(x)))

    target = 1e-3
    im_blur, sigma = calibrated_blur(x, target_mse=target)
    assert float(np.mean((im_blur - x) ** 2)) <= target * 1.02
    assert 0 < sigma <= 5.0


def test_recompression_scan():
    module, params = _setup()
    fn = make_recompression_fn(module, repeats=3)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 192, 192, 3))
    res = fn(params, x)
    assert res["bpp_trajectory"].shape == (3,)
    for k in ("bpp", "psnr", "msim"):
        assert np.isfinite(float(res[k])), k


def test_transfer_eval_identity_noise():
    module, params = _setup()
    fn = make_transfer_eval_fn(module)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3)) * 0.8 + 0.1
    noise = jnp.full_like(x, 1e-3)
    vi = fn(params, x, noise)
    assert np.isfinite(float(vi))


def test_cross_model_matrix_lazy_thunks():
    """Lazy (thunk) legs produce the same matrix as eager (fn, params) pairs
    and each model only lives for its own leg (the full trained matrix does
    not fit every family in HBM at once)."""
    from imagecompression_adversarial_tpu.analysis import cross_model_matrix

    module, params = _setup()
    fn = make_transfer_eval_fn(module)
    # a do-nothing "attack": noise is a constant offset
    attack = lambda p, x: {"im_": jnp.clip(x + 5e-3, 0.0, 1.0)}
    images = [
        np.asarray(
            jax.random.uniform(jax.random.PRNGKey(7 + i), (1, 64, 64, 3)) * 0.8
            + 0.1,
            np.float32,
        )
        for i in range(2)
    ]

    quiet = lambda s: None
    eager = cross_model_matrix(
        [(attack, params)], [(fn, params)], images, log=quiet
    )

    made = []

    def attack_thunk():
        made.append("attack")
        return attack, params

    def eval_thunk():
        made.append("eval")
        return make_transfer_eval_fn(_setup()[0]), params

    lazy = cross_model_matrix([attack_thunk], [eval_thunk], images, log=quiet)
    assert made == ["attack", "eval"]
    np.testing.assert_allclose(lazy, eager, atol=1e-4)


def test_detect_fn_flags_out_of_range():
    g_a = lambda x: x * 10.0
    detect = make_detect_fn(g_a, channel_max=[1.0, 1.0, 1.0], channel_min=[-2.0, -2.0, -2.0])
    benign = jnp.zeros((1, 4, 4, 3))
    hot = jnp.ones((1, 4, 4, 3))
    assert float(detect(benign)) == 0.0
    assert float(detect(hot)) > 1.0
    ranked = search_corpus(detect, [("a", np.zeros((1, 4, 4, 3), np.float32)),
                                    ("b", np.ones((1, 4, 4, 3), np.float32))])
    assert ranked[0][0] == "b"


def test_predicted_distribution_sums_to_one():
    means = jnp.zeros((2, 2))
    scales = jnp.ones((2, 2))
    pmf = predicted_distribution(means, scales, grid=(-15, 15))
    totals = np.asarray(jnp.sum(pmf, axis=0))
    np.testing.assert_allclose(totals, 1.0, atol=1e-4)


def test_rate_inflation_ranking():
    lik_nat = jnp.full((1, 2, 2, 3), 0.5)
    lik_adv = lik_nat.at[..., 1].set(0.25)  # channel 1 doubles its bits
    out = rate_inflation_ranking(lik_nat, lik_adv)
    assert out["ranking"][0] == 1
    assert out["inflation"][1] > out["inflation"][0]


def test_latent_histogram():
    y = jnp.zeros((1, 4, 4, 2))
    hist, edges = latent_histogram(y, channel=0, bins=61)
    assert hist.shape == (61,)
    assert hist[np.argmax(hist)] > 0
