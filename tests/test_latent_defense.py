"""clip_dead_channel defense + from_latent re-entry tests
(ref `/root/reference/self_ensemble.py:133-154`)."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecompression_adversarial_tpu.analysis.feature_range import profile_latents
from imagecompression_adversarial_tpu.defenses import (
    clip_dead_channel,
    make_latent_defend_fn,
)
from imagecompression_adversarial_tpu.models import init_model, init_params


def _latent(C=8, H=4, W=4, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))


def test_dead_channels_clamped_to_bound():
    y = jnp.zeros((1, 2, 2, 4)).at[..., 1].set(10.0).at[..., 2].set(-7.0)
    dead = np.array([False, True, True, False])
    ranks_min = np.zeros(4, np.int64)  # no rank-based clamping (tolerance)
    out = clip_dead_channel(y, dead, ranks_min, tolerance=100)
    np.testing.assert_allclose(np.asarray(out[..., 1]), 1.5)
    np.testing.assert_allclose(np.asarray(out[..., 2]), -1.5)
    np.testing.assert_allclose(np.asarray(out[..., 0]), np.asarray(y[..., 0]))


def test_misranked_channel_clamped_to_rank_reference_amplitude():
    # channel 0 is profiled to rank no better than 3 (ranks_min=3); craft an
    # input where it ranks 0 with tolerance 2 -> must be clamped to the
    # abs-max of channel ranks_min[0]=3 (ref indexing, self_ensemble.py:151)
    C = 4
    y = jnp.zeros((1, 2, 2, C))
    y = y.at[0, 0, 0, 0].set(100.0)  # hugely active -> rank 0
    y = y.at[0, 0, 0, 1].set(3.0)
    y = y.at[0, 0, 0, 2].set(2.0)
    y = y.at[0, 0, 0, 3].set(1.0)
    dead = np.zeros(C, bool)
    ranks_min = np.array([3, 0, 0, 0])
    out = clip_dead_channel(y, dead, ranks_min, tolerance=2)
    # cap = absmax[channel 3] = 1.0
    assert float(out[0, 0, 0, 0]) == 1.0
    # others untouched
    np.testing.assert_allclose(np.asarray(out[0, 0, 0, 1:]), [3.0, 2.0, 1.0])


def test_within_tolerance_passthrough():
    y = _latent()
    dead = np.zeros(y.shape[-1], bool)
    ranks_min = np.zeros(y.shape[-1], np.int64)  # rank >= ranks_min - 100 always
    out = clip_dead_channel(y, dead, ranks_min, tolerance=100)
    np.testing.assert_allclose(np.asarray(out), np.asarray(y))


def test_profile_latents_rank_and_dead_stats():
    # identity "encoder" over crafted images with known channel amplitudes
    g_a = lambda x: x
    rng = np.random.RandomState(1)
    images = [rng.randn(1, 4, 4, 3).astype(np.float32) * np.array([10.0, 1.0, 0.1], np.float32)
              for _ in range(5)]
    prof = profile_latents(g_a, images, k=1)
    # channel 0 always ranks 0, channel 2 always ranks 2
    assert prof["ranks_min"][0] == 0 and prof["ranks_max"][0] == 0
    assert prof["ranks_min"][2] == 2 and prof["ranks_max"][2] == 2
    # channel 2 never leaves [-2, 2] -> dead; channel 0 does not
    assert bool(prof["dead"][2]) and not bool(prof["dead"][0])


def test_latent_defend_fn_on_debug_codec():
    module = init_model("debug", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    C = module.apply({"params": params}, x, method="g_a").shape[-1]

    dead = np.zeros(C, bool)
    dead[0] = True
    from functools import partial

    transform = partial(
        clip_dead_channel, dead=dead, ranks_min=np.zeros(C, np.int64)
    )
    defend = make_latent_defend_fn(module, params, transform)
    x_hat, lik = defend(x)
    assert x_hat.shape == x.shape
    assert set(lik) == {"y", "z"}

    # the clamp really changes an out-of-range latent's reconstruction:
    # compare against the undefended from_latent forward
    y = module.apply({"params": params}, x, method="g_a")
    y_spiked = y.at[..., 0].set(50.0)
    res_raw = module.apply(
        {"params": params}, y_spiked, "dequantize", method="from_latent"
    )
    res_clamped = module.apply(
        {"params": params}, transform(y_spiked), "dequantize", method="from_latent"
    )
    diff = float(jnp.max(jnp.abs(res_raw["x_hat"] - res_clamped["x_hat"])))
    assert diff > 1e-3


def test_from_latent_matches_full_forward():
    for name in ("factorized", "hyper", "context", "cheng2020"):
        module = init_model(name, 1)
        params = init_params(module, jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
        full = module.apply({"params": params}, x, quant_mode="dequantize")
        y = module.apply({"params": params}, x, method="g_a")
        part = module.apply(
            {"params": params}, y, "dequantize", method="from_latent"
        )
        np.testing.assert_allclose(
            np.asarray(full["x_hat"]), np.asarray(part["x_hat"]), atol=1e-6
        )


def test_adaptive_clip_attack_in_loop():
    """defend_in_loop='clip' routes the output phase through the latent
    clamp (ADVICE r2: previously fell through to the undefended forward)."""
    import pytest

    from imagecompression_adversarial_tpu.attacks import (
        RDAttackConfig,
        make_attack_fn,
    )

    module = init_model("debug", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    C = module.apply({"params": params}, x, method="g_a").shape[-1]

    from functools import partial

    dead = np.ones(C, bool)  # clamp every channel hard so the path matters
    transform = partial(
        clip_dead_channel,
        dead=dead,
        ranks_min=np.zeros(C, np.int64),
        dead_bound=0.05,
    )
    cfg = RDAttackConfig(steps=4, defend_in_loop="clip", debug_model=True)
    attack = make_attack_fn(module, cfg, latent_transform=transform)
    key = jax.random.PRNGKey(5)
    res = attack(params, x, key)
    assert np.isfinite(float(res["vi"]))

    # same config, undefended loop: different delivered noise proves the
    # clip branch is live inside the loss
    cfg_plain = RDAttackConfig(steps=4, debug_model=True)
    res_plain = make_attack_fn(module, cfg_plain)(params, x, key)
    assert float(jnp.max(jnp.abs(res["im_"] - res_plain["im_"]))) > 1e-7

    # missing transform -> clear error, not a silent fall-through
    with pytest.raises(ValueError, match="latent_transform"):
        make_attack_fn(module, cfg)(params, x, key)


def test_unknown_defend_in_loop_raises():
    import pytest

    from imagecompression_adversarial_tpu.attacks import (
        RDAttackConfig,
        make_attack_fn,
    )

    module = init_model("debug", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    cfg = RDAttackConfig(steps=2, defend_in_loop="typo")
    with pytest.raises(ValueError, match="defend_in_loop"):
        make_attack_fn(module, cfg)(params, x)


def test_load_range_profile_require_keys(tmp_path):
    import pytest

    from imagecompression_adversarial_tpu.defenses import load_range_profile

    p = tmp_path / "old_profile.npz"
    np.savez(p, channel_max=np.ones(4), channel_min=-np.ones(4))
    # range-only load still works
    prof = load_range_profile(str(p))
    assert "channel_max" in prof
    # clip-path load fails with the re-profile hint
    with pytest.raises(ValueError, match="dead"):
        load_range_profile(str(p), require=("dead", "ranks_min"))
