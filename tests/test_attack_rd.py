"""RD attack engine tests: LR schedule parity vs torch, constraint
satisfaction, and end-to-end scan behaviour."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from imagecompression_adversarial_tpu.attacks import (
    RDAttackConfig,
    make_attack_fn,
    multistep_lr_schedule,
)
from imagecompression_adversarial_tpu.models import init_model, init_params


def test_multistep_lr_matches_torch():
    """Reproduce the reference's scheduler wiring exactly: MultiStepLR
    ([1,2,3], 0.33) stepped whenever i % (steps//3) == 0, lr read before the
    step (`/root/reference/attack_rd.py:502-503,553-554`)."""
    steps, base = 50, 0.01
    param = torch.zeros(1, requires_grad=True)
    opt = torch.optim.Adam([param], lr=base)
    sched = torch.optim.lr_scheduler.MultiStepLR(opt, [1, 2, 3], gamma=0.33)
    torch_lrs = []
    d = steps // 3
    for i in range(steps):
        torch_lrs.append(opt.param_groups[0]["lr"])
        if i % d == 0:
            sched.step()
    ours = multistep_lr_schedule(steps, base, 0.33)
    np.testing.assert_allclose(ours, np.array(torch_lrs, np.float32), rtol=1e-6)


def test_attack_respects_constraints():
    module = init_model("hyper", 1)
    key = jax.random.PRNGKey(0)
    params = init_params(module, key)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 192, 192, 3))

    cfg = RDAttackConfig(steps=8, epsilon=4.0)
    attack = make_attack_fn(module, cfg)
    res = attack(params, x)

    adv = np.asarray(res["im_"])
    noise = adv - np.asarray(x)
    assert np.abs(noise).max() <= 4.0 / 255.0 + 1e-6
    assert adv.min() >= 0.0 and adv.max() <= 1.0
    for k in ("bpp_ori", "bpp", "vi", "mse_in", "mse_out"):
        assert np.isfinite(float(res[k])), k


def test_attack_two_phase_loss_reduces_input_when_over_budget():
    """With a huge initial noise (debug-model style init) the first phase
    drives the input loss down toward the budget."""
    module = init_model("debug", 1)
    key = jax.random.PRNGKey(0)
    params = init_params(module, key)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 192, 192, 3))

    cfg = RDAttackConfig(steps=12, noise_threshold=1e-4, debug_model=True,
                         epsilon=255.0)
    attack = make_attack_fn(module, cfg)
    res = attack(params, x, key=jax.random.PRNGKey(3))
    # finite outputs; the loop ran both phases without NaN
    assert np.isfinite(float(res["loss_i_final"]))
    assert np.isfinite(float(res["loss_o_final"]))


def test_attack_increases_output_distortion():
    """On any codec the unconstrained objective 1 - MSE(out, out_s) must
    decrease over the scan (output distortion grows)."""
    module = init_model("factorized", 1)
    key = jax.random.PRNGKey(0)
    params = init_params(module, key)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 192, 192, 3))

    res_short = make_attack_fn(module, RDAttackConfig(steps=2))(params, x)
    res_long = make_attack_fn(module, RDAttackConfig(steps=25))(params, x)
    assert float(res_long["mse_out"]) >= float(res_short["mse_out"]) * 0.5
    # attack produced nonzero perturbation
    assert float(res_long["mse_in"]) > 0


def test_remat_policies_agree():
    """remat=False, full remat, and save-only-latents remat are the same
    math — the attack trajectory must agree to float tolerance."""
    import numpy as np

    module = init_model("hyper", 1)
    params = init_params(module, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3), jnp.float32)

    results = [
        make_attack_fn(module, RDAttackConfig(steps=6, remat=remat,
                                              remat_policy=policy))(params, x)
        for remat, policy in
        ((False, "full"), (True, "full"), (True, "latents"))
    ]
    for other in results[1:]:
        np.testing.assert_allclose(
            float(results[0]["vi"]), float(other["vi"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(results[0]["im_"]), np.asarray(other["im_"]),
            atol=1e-6,
        )


def test_phase_space_loss_matches_plain_attack():
    """phase_space_loss=True must deliver the SAME attack (MSE is invariant
    under the depth-to-space permutation) — only the memory layout of the
    hot loop changes (the 12.6 MP OOM fix, RESULTS.md round 3)."""
    module = init_model("hyper", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))

    res_plain = make_attack_fn(
        module, RDAttackConfig(steps=6, phase_space_loss=False)
    )(params, x)
    res_phase = make_attack_fn(
        module, RDAttackConfig(steps=6, phase_space_loss=True)
    )(params, x)
    np.testing.assert_allclose(
        np.asarray(res_phase["im_"]), np.asarray(res_plain["im_"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        float(res_phase["vi"]), float(res_plain["vi"]), rtol=1e-4, atol=1e-4
    )

    import pytest

    with pytest.raises(ValueError, match="phase_space_loss"):
        make_attack_fn(
            module,
            RDAttackConfig(steps=2, phase_space_loss=True, att_metric="ms-ssim"),
        )(params, x)


def test_g_s_phase_is_d2s_inverse_of_g_s():
    from imagecompression_adversarial_tpu.models.layers import (
        depth_to_space,
        space_to_depth,
    )

    module = init_model("hyper", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    y = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 6, module.M))
    full = module.apply({"params": params}, y, method=module.g_s)
    phase = module.apply({"params": params}, y, method=module.g_s_phase)
    # g_s_phase emits NCHW (channel-major: zero layout padding on TPU)
    phase_nhwc = np.transpose(np.asarray(phase), (0, 2, 3, 1))
    np.testing.assert_allclose(
        np.asarray(depth_to_space(phase_nhwc)), np.asarray(full),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(space_to_depth(np.asarray(full))), phase_nhwc,
        rtol=1e-5, atol=1e-5,
    )


def test_split_eval_matches_single_program():
    """split_eval=True (two XLA programs, the 12.6 MP peak-memory fix) must
    produce the same results as the single-program attack."""
    module = init_model("hyper", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))

    res_one = make_attack_fn(
        module, RDAttackConfig(steps=5, phase_space_loss=True)
    )(params, x)
    res_two = make_attack_fn(
        module, RDAttackConfig(steps=5, phase_space_loss=True, split_eval=True)
    )(params, x)
    for k in ("vi", "bpp", "bpp_ori", "mse_in", "mse_out"):
        np.testing.assert_allclose(
            float(res_two[k]), float(res_one[k]), rtol=1e-5, atol=1e-6
        )
    np.testing.assert_allclose(
        np.asarray(res_two["im_"]), np.asarray(res_one["im_"]),
        rtol=1e-6, atol=1e-7,
    )

    import pytest

    with pytest.raises(ValueError, match="split_eval"):
        make_attack_fn(
            module,
            RDAttackConfig(steps=2, split_eval=True, phase_space_loss=False),
        )
    # debug_model would silently change split_eval's piecewise-eval clamping
    # semantics vs the single-program path (ADVICE r3) — reject it
    with pytest.raises(ValueError, match="debug_model"):
        make_attack_fn(
            module,
            RDAttackConfig(steps=2, split_eval=True, phase_space_loss=True,
                           debug_model=True),
        )


def test_best_of_restarts_host_loops_split_eval():
    """best_of_restarts must NOT vmap a split_eval attack (vmap would inline
    the two jitted programs back into one, forfeiting the per-program HBM
    peak — ADVICE r3); the host loop must still return the highest-VI
    restart, matching the vmapped single-program result."""
    from imagecompression_adversarial_tpu.attacks import best_of_restarts

    module = init_model("hyper", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    keys = jax.random.split(jax.random.PRNGKey(7), 2)

    split = make_attack_fn(
        module,
        RDAttackConfig(steps=4, phase_space_loss=True, split_eval=True,
                       random_restarts=2),
    )
    assert split.eval_jit is not None  # the host-loop trigger
    best_split = best_of_restarts(split, params, x, keys)

    # the host loop must return exactly the highest-VI individual restart
    singles = [split(params, x, k) for k in keys]
    winner = max(range(len(singles)), key=lambda i: float(singles[i]["vi"]))
    np.testing.assert_allclose(
        float(best_split["vi"]), float(singles[winner]["vi"]), rtol=0, atol=0
    )
    np.testing.assert_array_equal(
        np.asarray(best_split["im_"]), np.asarray(singles[winner]["im_"])
    )
    # and agree with the vmapped single-program selection on the metric
    one = make_attack_fn(
        module,
        RDAttackConfig(steps=4, phase_space_loss=True, random_restarts=2),
    )
    best_one = best_of_restarts(one, params, x, keys)
    np.testing.assert_allclose(
        float(best_split["vi"]), float(best_one["vi"]), rtol=1e-5, atol=1e-6
    )


def test_forced_phase_loss_capability_raise_everywhere():
    """The supports_phase_synthesis gate must fire in every attack-builder
    entry point, not just make_attack_fn (ADVICE r3: make_ifgsm_fn /
    make_adv_example_fn used the flag unchecked)."""
    import pytest

    from imagecompression_adversarial_tpu.attacks import make_adv_example_fn
    from imagecompression_adversarial_tpu.attacks.ifgsm import (
        IFGSMConfig,
        make_ifgsm_fn,
    )

    tic = init_model("tic", 1)
    assert not getattr(tic, "supports_phase_synthesis")
    with pytest.raises(ValueError, match="supports_phase_synthesis"):
        make_ifgsm_fn(tic, IFGSMConfig(steps=2, phase_space_loss=True))
    with pytest.raises(ValueError, match="supports_phase_synthesis"):
        make_adv_example_fn(
            tic, RDAttackConfig(steps=2, phase_space_loss=True)
        )


def test_phase_space_auto_resolution():
    """phase_space_loss=None (the default) resolves ON for codecs that
    declare an exact phase synthesis and the plain L2 config, OFF
    otherwise; explicit True on an unsupported codec raises."""
    import pytest

    hyper = init_model("hyper", 1)
    params = init_params(hyper, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))

    # auto-on must equal the forced-off attack (exact same trajectory)
    res_auto = make_attack_fn(hyper, RDAttackConfig(steps=4))(params, x)
    res_off = make_attack_fn(
        hyper, RDAttackConfig(steps=4, phase_space_loss=False)
    )(params, x)
    np.testing.assert_allclose(
        np.asarray(res_auto["im_"]), np.asarray(res_off["im_"]),
        rtol=1e-5, atol=1e-6,
    )

    # unsupported codec family: auto falls back to the plain loss (no
    # error), explicit True raises
    tic = init_model("tic", 1)
    assert not getattr(tic, "supports_phase_synthesis")
    tic_params = init_params(tic, jax.random.PRNGKey(2))
    res_tic = make_attack_fn(tic, RDAttackConfig(steps=2))(tic_params, x)
    assert np.isfinite(float(res_tic["vi"]))
    with pytest.raises(ValueError, match="supports_phase_synthesis"):
        make_attack_fn(tic, RDAttackConfig(steps=2, phase_space_loss=True))


def test_cheng2020_and_nlaic_phase_matches_g_s():
    """The overridden phase syntheses (cheng2020's SubpelConv form, NLAIC's
    NLAM-interleaved chain) must reproduce g_s exactly up to their fixed
    spatial-phase permutation."""
    from imagecompression_adversarial_tpu.models.layers import pixel_shuffle

    cheng = init_model("cheng2020", 1)
    params = init_params(cheng, jax.random.PRNGKey(0))
    y = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 6, cheng.M))
    full = cheng.apply({"params": params}, y, method=cheng.g_s)
    phase = cheng.apply({"params": params}, y, method=cheng.g_s_phase)
    phase_nhwc = jnp.transpose(jnp.asarray(phase), (0, 2, 3, 1))
    np.testing.assert_allclose(
        np.asarray(pixel_shuffle(phase_nhwc, 2)), np.asarray(full),
        rtol=1e-5, atol=1e-5,
    )

    from imagecompression_adversarial_tpu.models.layers import depth_to_space

    nlaic = init_model("nlaic", 1)
    nparams = init_params(nlaic, jax.random.PRNGKey(1))
    yn = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 6, nlaic.M))
    fulln = nlaic.apply({"params": nparams}, yn, method=nlaic.g_s)
    phasen = nlaic.apply({"params": nparams}, yn, method=nlaic.g_s_phase)
    phasen_nhwc = np.transpose(np.asarray(phasen), (0, 2, 3, 1))
    np.testing.assert_allclose(
        np.asarray(depth_to_space(phasen_nhwc)), np.asarray(fulln),
        rtol=1e-5, atol=1e-5,
    )


def test_two_phase_select_matches_cond():
    """two_phase_impl='select' (scalar where-blend) must reproduce the
    lax.cond attack exactly — same gradients (where's vjp masks the
    unselected branch), same trajectory, same result."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecompression_adversarial_tpu.attacks import (
        RDAttackConfig,
        make_attack_fn,
    )
    from imagecompression_adversarial_tpu.models import init_model, init_params

    module = init_model("hyper", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)

    cfg = RDAttackConfig(steps=8, noise_threshold=1e-6)  # exercises BOTH phases
    res_cond = make_attack_fn(module, cfg)(params, x)
    res_sel = make_attack_fn(
        module, dataclasses.replace(cfg, two_phase_impl="select")
    )(params, x)
    np.testing.assert_allclose(
        np.asarray(res_cond["im_"]), np.asarray(res_sel["im_"]), atol=1e-7
    )
    np.testing.assert_allclose(
        float(res_cond["vi"]), float(res_sel["vi"]), rtol=1e-5
    )


def test_best_of_restarts_host_impl_matches_vmap():
    """impl='host' (sequential big-model fallback; the vmapped fic 768x512
    best-of-2 reproducibly crashes the TPU worker) must pick the same
    winner as the vmapped path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecompression_adversarial_tpu.attacks import (
        RDAttackConfig,
        best_of_restarts,
        make_attack_fn,
    )
    from imagecompression_adversarial_tpu.models import init_model, init_params

    module = init_model("debug", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)
    cfg = RDAttackConfig(steps=5, random_restarts=2, debug_model=True)
    attack = make_attack_fn(module, cfg)
    keys = jax.random.split(jax.random.PRNGKey(7), 2)
    r_vmap = best_of_restarts(attack, params, x, keys)
    r_host = best_of_restarts(attack, params, x, keys, impl="host")
    np.testing.assert_allclose(
        float(r_vmap["vi"]), float(r_host["vi"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(r_vmap["im_"]), np.asarray(r_host["im_"]), atol=1e-6
    )


def test_two_phase_impl_validated():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import pytest

    from imagecompression_adversarial_tpu.attacks import (
        RDAttackConfig,
        make_attack_fn,
    )
    from imagecompression_adversarial_tpu.models import init_model, init_params

    module = init_model("debug", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    for bad in (
        RDAttackConfig(steps=2, two_phase_impl="Select"),
        RDAttackConfig(steps=2, two_phase_impl="select", att_metric="ms-ssim"),
    ):
        with pytest.raises(ValueError):
            make_attack_fn(module, dataclasses.replace(bad, debug_model=True))(
                params, x, jax.random.PRNGKey(1)
            )
