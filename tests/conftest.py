"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes (SURVEY §4 implication (d)).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The sandbox's axon site-hook forces platforms back to "axon,cpu"; override
# post-import so tests really run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Parity tests compare against float64 torch references; the default
# (bf16-class) conv precision is a perf knob for the TPU attack path, not
# for correctness tests.
jax.config.update("jax_default_matmul_precision", "highest")

# NOTE: no persistent compilation cache here — the sandbox's CPU AOT cache
# is machine-feature-sensitive and reloading entries across hosts emits
# SIGILL warnings.

import pytest  # noqa: E402

# Tests measured >5s on the 1-vCPU sandbox (full-suite --durations profile).
# Kept in one place so `pytest -m "not slow"` stays an actionable fast path;
# re-profile and update when adding heavyweight tests.
_SLOW_TESTS = {
    "test_make_kodak24_corpus",
    "test_tic_forward_and_attack",
    "test_fic_forward_and_attack",
    "test_cheng_attn_forward_and_attack",
    "test_targeted_attack_moves_output_toward_target",
    "test_classifier_targeted_attack",
    "test_masked_attack_runs",
    "test_cheng_gmm_codec_forward_and_attack",
    "test_nlaic_forward_and_attack",
    "test_cw_attack_converges_toward_budget",
    "test_cw_fast_variant",
    "test_cw_exact_budget_eval_search",
    "test_multistart_picks_best_vi",
    "test_pgd_random_start_differs_from_bim",
    "test_bim_respects_linf_ball",
    "test_mifgsm_momentum_path",
    "test_tic_roundtrip",
    "test_roundtrip",  # TestRealCodec parametrized hyper/factorized
    "test_attack_increases_output_distortion",
    "test_attack_two_phase_loss_reduces_input_when_over_budget",
    "test_attack_respects_constraints",
    "test_train_step_updates_params_and_quantiles",
    "test_rate_distortion_loss_mse",
    "test_golden_reconstruction_quality",
    "test_golden_real_coder_agreement",
    "test_noise_eval",
    "test_converted_transforms_match_torch_forward",
    "test_ar_roundtrip_reproduces_encoder_state",
    "test_grad_flows_through_quant_free_path",
    "test_latent_defend_fn_on_debug_codec",
    "test_from_latent_matches_full_forward",
    "test_lpips_identity_is_zero_and_symmetric",
    "test_lpips_orders_perturbation_magnitude",
    "test_lpips_is_differentiable_and_jittable",
    "test_rd_loss_lpips_branch_trains",
    "test_hific_generator_loss_accepts_lpips",
    "test_fic_context4_causality",
    "test_fic_first_phase_is_hyper_only",
    "test_remat_policies_agree",
    "test_row_sharded_forward_matches_single_device",
    "test_row_sharded_attack_matches_single_device",
    # round-5 additions (codec inits / torch replicas are >5s on this host)
    "test_compress_reports_ideal_bits",
    "test_fic_estimate_uses_means_free_symbols",
    "test_converted_torch_weights_match_torch_replica",
    "test_alex_feature_fn_serves_fid",
    "test_rate_distortion_loss_lpips_branch_differentiable",
    "test_batch_attack_vmap_matches_single",
    "test_best_of_restarts_picks_max_vi",
    "test_realcodec_context4_roundtrip",
    "test_parity_harness_self_test",
    "test_adaptive_clip_attack_in_loop",
    # round-3 re-profile (--durations under TPU-load, 1-vCPU): every test
    # >30s moves to the slow tier so `-m "not slow"` stays an actionable
    # <8-min path; the full suite still runs them
    "test_sharded_attack_matches_single_device",
    "test_multichip_dryrun_8_devices",
    "test_sharded_attack_pads_ragged_batch",
    "test_gan_train_step_runs",
    "test_invcompress_forward_and_attack",
    "test_hific_forward_and_attack",
    "test_golden_ensemble_defense_helps_augmented_model",
    "test_invcomp_is_exactly_invertible",
    "test_train_resume_continues_steps",
    "test_realcodec_gmm_roundtrip",
    "test_golden_attack_amplifies_error",
    "test_train_loop_runs_and_checkpoints",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
