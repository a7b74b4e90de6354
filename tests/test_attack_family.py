"""I-FGSM / PGD / MI-FGSM and C&W attack tests (small step counts)."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecompression_adversarial_tpu.attacks.cw import CWAttackConfig, make_cw_attack_fn
from imagecompression_adversarial_tpu.attacks.ifgsm import (
    IFGSMConfig,
    best_of_multistart,
    make_ifgsm_fn,
)
from imagecompression_adversarial_tpu.models import init_model, init_params


def _setup(name="factorized"):
    module = init_model(name, 1)
    params = init_params(module, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 192, 192, 3))
    return module, params, x


def test_bim_respects_linf_ball():
    module, params, x = _setup()
    cfg = IFGSMConfig(steps=6, epsilon=8.0)
    res = make_ifgsm_fn(module, cfg)(params, x)
    noise = np.asarray(res["im_"]) - np.asarray(x)
    assert np.abs(noise).max() <= 8.0 / 255.0 + 1e-5
    assert np.isfinite(float(res["vi"]))


def test_ifgsm_phase_space_matches_plain():
    """The phase-space I-FGSM loss must produce the IDENTICAL trajectory:
    the loss gradient is the same tensor up to the d2s permutation, so
    sign(grad) steps match exactly."""
    module, params, x = _setup()
    plain = make_ifgsm_fn(
        module, IFGSMConfig(steps=5, phase_space_loss=False)
    )(params, x)
    phase = make_ifgsm_fn(
        module, IFGSMConfig(steps=5, phase_space_loss=True)
    )(params, x)
    np.testing.assert_allclose(
        np.asarray(phase["im_"]), np.asarray(plain["im_"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        float(phase["vi"]), float(plain["vi"]), rtol=1e-4, atol=1e-4
    )


def test_pgd_random_start_differs_from_bim():
    module, params, x = _setup()
    bim = make_ifgsm_fn(module, IFGSMConfig(steps=4))(params, x)
    pgd = make_ifgsm_fn(module, IFGSMConfig(steps=4, random_start=True))(
        params, x, jax.random.PRNGKey(7)
    )
    assert not np.allclose(np.asarray(bim["im_"]), np.asarray(pgd["im_"]))


def test_mifgsm_momentum_path():
    module, params, x = _setup()
    cfg = IFGSMConfig(steps=5, momentum=True)
    res = make_ifgsm_fn(module, cfg)(params, x)
    adv = np.asarray(res["im_"])
    assert adv.min() >= 0.0 and adv.max() <= 1.0
    assert np.isfinite(float(res["vi"]))


def test_multistart_picks_best_vi():
    module, params, x = _setup()
    attack = make_ifgsm_fn(module, IFGSMConfig(steps=3, random_start=True))
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    best = best_of_multistart(attack, params, x, keys)
    singles = [attack(params, x, k) for k in keys]
    assert float(best["vi"]) == max(float(s["vi"]) for s in singles)


def test_multistart_runs_starts_sequentially():
    # Regression: vmapping the whole attack over starts multiplies live
    # HBM by n_starts and crashes the v5e worker at 768x512 — the starts
    # must be dispatched one at a time (one host-level call per key).
    module, params, x = _setup()
    attack = make_ifgsm_fn(module, IFGSMConfig(steps=2, random_start=True))
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    calls = []

    def counting_attack(p, im, k):
        calls.append(np.asarray(k))  # concrete key => not a vmap tracer
        return attack(p, im, k)

    best_of_multistart(counting_attack, params, x, keys)
    assert len(calls) == len(keys)


def test_cw_attack_converges_toward_budget():
    module, params, x = _setup()
    cfg = CWAttackConfig(steps=5, search_steps=3, noise_threshold=1e-4)
    res = make_cw_attack_fn(module, cfg)(params, x)
    assert np.isfinite(float(res["vi"]))
    assert float(res["mse_in"]) <= 0.1 + 1e-6  # bounded by the outer range
    assert int(res["outer_rounds"]) >= 1


def test_cw_fast_variant():
    module, params, x = _setup()
    cfg = CWAttackConfig(steps=4, search_steps=3, fast=True)
    res = make_cw_attack_fn(module, cfg)(params, x)
    assert np.isfinite(float(res["vi"]))


def test_cw_exact_budget_eval_search():
    """Post-hoc amplitude bisection (ref attack_cw.py:44-54): reported
    mse_in must not overshoot the budget by more than the 1/256-cap slack."""
    module, params, x = _setup()
    budget = 1e-4
    cfg = CWAttackConfig(steps=5, search_steps=4, noise_threshold=budget)
    res = make_cw_attack_fn(module, cfg)(params, x)
    mse_in = float(res["mse_in"])
    # cap granularity 1/256 on |noise| bounds the overshoot:
    # mse(max_n) - mse(min_n) <= 2 * eps_inf / 256 per pixel in the worst case
    slack = 2.0 * (cfg.epsilon / 255.0) / 256.0
    assert mse_in <= budget + slack, mse_in
