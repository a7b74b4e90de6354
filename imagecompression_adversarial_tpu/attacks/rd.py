"""The canonical RD distortion attack, compiled as one `lax.scan`.

Reference semantics (`/root/reference/attack_rd.py:332-575`):
  * optimize an additive noise variable with Adam (lr 0.01, MultiStepLR x0.33)
  * every step: gated-STE clip of the noise to +-eps/255, then of the input
    to [0, 1]
  * two-phase loss: while input MSE exceeds the budget, minimize the input
    loss; otherwise maximize output distortion
    ``1 - MSE(g_s(g_a(x)), out_clean)`` through the quantization-free path
    (`quant_mode='none'``); MS-SSIM variant supported
  * final evaluation with real (round) quantization.

TPU-first design (SURVEY §7.1): the 1001-iteration hot loop is a single
jitted ``lax.scan`` over (noise, Adam state) carrying a precomputed LR
trajectory; per-image Python iteration, host syncs, and optimizer-object
overhead all disappear.  Random restarts and image batches become `vmap`
axes instead of outer loops (ref loops at `attack_rd.py:654-664`).
`lax.cond` keeps only one loss phase live per step on a single sample.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..metrics import bpp_from_likelihoods, ms_ssim
from ..ops.bounds import bound_clip
from .common import (
    RDAttackConfig,
    adam_on_noise,
    init_noise,
    multistep_lr_schedule,
    remat_transform,
)
from .evaluate import evaluate


_DEFEND_IN_LOOP = (None, "ensemble", "bitdepth", "resize", "clip")


def _attack_loss(
    apply_fn, x, output_s, noise, cfg: RDAttackConfig, clip_fn=None,
    phase_fn=None,
):
    """Two-phase RD attack loss (ref ``attack_our``, `attack_rd.py:332-379`).

    ``clip_fn`` (required when ``cfg.defend_in_loop == 'clip'``) maps the
    perturbed input straight through the latent-clamp defense
    (g_a -> clamp -> from_latent, quant-free) so the adaptive attack
    optimizes THROUGH the clamp (ref latent defenses `attack_rd.py:44-73`).

    ``phase_fn`` (set iff ``cfg.phase_space_loss``) maps the perturbed input
    to the quant-free synthesis in PHASE SPACE; ``output_s`` is then the
    phase-space clean reference — the loss value (and hence the gradient
    and the whole attack trajectory) is identical because MSE is invariant
    under the depth-to-space permutation.

    Returns (loss, (loss_i, loss_o)).
    """
    if cfg.defend_in_loop not in _DEFEND_IN_LOOP:
        raise ValueError(
            f"defend_in_loop={cfg.defend_in_loop!r} not in {_DEFEND_IN_LOOP}"
        )
    if cfg.defend_in_loop == "clip" and clip_fn is None:
        raise ValueError(
            "defend_in_loop='clip' needs a latent_transform; pass it to "
            "make_attack_fn(..., latent_transform=...)"
        )
    eps = cfg.epsilon / 255.0
    noise_c = bound_clip(noise, -eps, eps)
    if cfg.debug_model:
        im_in = x + noise_c
    else:
        im_in = bound_clip(x + noise_c, 0.0, 1.0)
    loss_i = jnp.mean((x - im_in) ** 2)

    def input_phase(_):
        if cfg.att_metric == "ms-ssim":
            loss = 1.0 - ms_ssim(x, im_in)
        else:
            loss = loss_i
        return loss, jnp.asarray(0.0, loss_i.dtype)

    def output_phase(_):
        if cfg.defend_in_loop == "ensemble":
            from ..defenses.self_ensemble import self_ensemble

            x_ = self_ensemble(
                apply_fn, im_in, quant_mode="none", impl=cfg.ensemble_impl
            )["x_hat"]
        elif cfg.defend_in_loop == "bitdepth":
            from ..defenses.self_ensemble import bitdepth_reduction

            x_ = apply_fn(bitdepth_reduction(im_in), quant_mode="none")["x_hat"]
        elif cfg.defend_in_loop == "resize":
            from ..defenses.self_ensemble import random_resize

            x_ = apply_fn(random_resize(im_in)[0], quant_mode="none")["x_hat"]
        elif cfg.defend_in_loop == "clip":
            x_ = clip_fn(im_in)
        elif phase_fn is not None:
            # phase-space branch: the clean reference arrives as a DENSE
            # 2-D tensor (a (H/2, W/2*12) phase tensor tiles (8,128) with
            # zero padding, while the 12-channel conv layout pads 10.7x —
            # as a loop invariant that padding would occupy HBM for the
            # whole scan); diff against a dense reshape of the output
            x_ = phase_fn(im_in)
            output_ = bound_clip(x_, 0.0, 1.0) if cfg.clamp else x_
            flat = output_.reshape(output_s.shape)
            loss_o = 1.0 - jnp.mean((output_s - flat) ** 2)
            return loss_o, loss_o
        else:
            x_ = apply_fn(im_in, quant_mode="none")["x_hat"]
        output_ = bound_clip(x_, 0.0, 1.0) if cfg.clamp else x_
        if cfg.att_metric == "ms-ssim":
            loss_o = ms_ssim(output_, output_s)
        else:
            loss_o = 1.0 - jnp.mean((output_s - output_) ** 2)
        return loss_o, loss_o

    if cfg.two_phase_impl not in ("cond", "select"):
        raise ValueError(
            f"two_phase_impl={cfg.two_phase_impl!r} not in ('cond', 'select')"
        )
    if cfg.two_phase_impl == "select" and cfg.att_metric == "ms-ssim":
        raise ValueError(
            "two_phase_impl='select' supports the L2 att_metric only (the "
            "ms-ssim input phase has its own compute; use 'cond')"
        )
    if cfg.two_phase_impl == "select":
        # L2 input phase is just loss_i (already computed): always run the
        # output phase and blend the SCALARS.  jnp.where's vjp masks the
        # unselected branch, so gradients match lax.cond exactly; what
        # disappears is the per-step cond plumbing (operand copies).
        loss_o_val, _ = output_phase(None)
        over = loss_i > cfg.noise_threshold
        loss = jnp.where(over, loss_i, loss_o_val)
        loss_o = jnp.where(over, jnp.asarray(0.0, loss_i.dtype), loss_o_val)
        return loss, (loss_i, loss_o)
    loss, loss_o = jax.lax.cond(loss_i > cfg.noise_threshold, input_phase, output_phase, None)
    return loss, (loss_i, loss_o)


def make_attack_fn(
    module,
    cfg: RDAttackConfig,
    defend_fn_builder: Optional[Callable] = None,
    latent_transform: Optional[Callable] = None,
) -> Callable[..., Dict[str, Any]]:
    """Build the jitted end-to-end attack: (params, x, key) -> results.

    ``x`` is a single NHWC image batch of size 1 (vmap/batching wrappers sit
    on top).  ``defend_fn_builder(apply_fn)`` optionally supplies the defense
    used during evaluation (adaptive in-loop defenses hook into the defense
    module's own attack builder).  ``latent_transform`` (y -> y') is the
    profiled latent clamp for ``defend_in_loop='clip'`` adaptive attacks.
    """
    # resolve phase_space_loss=None (AUTO): on iff the config is the plain
    # L2 attack AND the codec declares an exact phase-space synthesis.
    # Measured +12% attack throughput at bench size (RESULTS.md round 3).
    supported = bool(getattr(module, "supports_phase_synthesis", False))
    if cfg.phase_space_loss is None:
        eligible = (
            cfg.att_metric != "ms-ssim"
            and not cfg.defend_in_loop
            and not cfg.pad
            and not cfg.debug_model
        )
        cfg = dataclasses.replace(
            cfg, phase_space_loss=bool(eligible and supported)
        )
    elif cfg.phase_space_loss and not supported:
        raise ValueError(
            f"phase_space_loss=True but {type(module).__name__} declares no "
            "exact phase-space synthesis (supports_phase_synthesis is not "
            "set; see CodecModel.g_s_phase)"
        )

    lrs = jnp.asarray(multistep_lr_schedule(cfg.steps, cfg.lr, cfg.lr_milgamma))
    opt = adam_on_noise()

    if cfg.split_eval:
        return _make_split_attack_fn(
            module, cfg, lrs, opt, defend_fn_builder, latent_transform
        )

    def attack(params, x, key: Optional[jax.Array] = None):
        apply_fn = lambda im, quant_mode: module.apply(
            {"params": params}, im, quant_mode=quant_mode
        )

        # clean reference output + rate (ref `attack_rd.py:401-419`); with
        # `-p` the clean forward sees a reflect-padded input and the
        # reference output is cropped back
        if cfg.pad:
            p = cfg.pad
            x_in = jnp.pad(
                x, ((0, 0), (p, p), (p, p), (0, 0)), mode=cfg.padding_mode
            )
            result_s = apply_fn(x_in, quant_mode="dequantize")
            output_s = jnp.clip(result_s["x_hat"][:, p:-p, p:-p, :], 0.0, 1.0)
        else:
            result_s = apply_fn(x, quant_mode="dequantize")
            output_s = (
                jnp.clip(result_s["x_hat"], 0.0, 1.0)
                if cfg.clamp
                else result_s["x_hat"]
            )
        num_pixels = x.shape[1] * x.shape[2]
        bpp_ori = bpp_from_likelihoods(result_s["likelihoods"], num_pixels)

        # phase-space loss: the clean reference for the scan loop is the
        # phase-major synthesis of the SAME clean latent —
        # depth_to_space(loss_ref) == output_s exactly, so the loss (and
        # the attack trajectory) is unchanged while the hot loop carries
        # no full-resolution 3-channel tensor (see RDAttackConfig)
        if cfg.phase_space_loss:
            if cfg.att_metric == "ms-ssim" or cfg.defend_in_loop or cfg.pad:
                raise ValueError(
                    "phase_space_loss supports the plain L2 attack only "
                    "(no ms-ssim metric, in-loop defense, or -p padding)"
                )
            # the latent the module's forward actually synthesizes from:
            # y_hat normally, the UN-quantized y for fic (models/fic.py:200)
            ref_y = result_s[getattr(module, "phase_reference_latent", "y_hat")]
            ref_ps = module.apply(
                {"params": params}, ref_y, method=module.g_s_phase
            )
            ref_ps = jnp.clip(ref_ps, 0.0, 1.0) if cfg.clamp else ref_ps
            # dense 2-D storage: zero layout padding as a scan invariant
            loss_ref = ref_ps.reshape(-1, ref_ps.shape[-1])
        else:
            loss_ref = output_s

        noise0 = init_noise(x.shape, cfg, key)
        opt_state0 = opt.init(noise0)

        # x / output_s / params enter the checkpointed function as ARGUMENTS,
        # not closures: jax.checkpoint rematerializes closed-over
        # intermediates, so a closure over the traced output_s would re-run
        # the whole clean dequantize forward in EVERY backward step
        # (measured: 138 vs 190 steps/s full-attack).
        def loss_fn(n, params_, x_, output_s_):
            af = lambda im, quant_mode: module.apply(
                {"params": params_}, im, quant_mode=quant_mode
            )
            cf = None
            if latent_transform is not None:

                def cf(im):
                    y = module.apply({"params": params_}, im, method=module.g_a)
                    return module.apply(
                        {"params": params_},
                        latent_transform(y),
                        "none",
                        method=module.from_latent,
                    )["x_hat"]

            pf = None
            if cfg.phase_space_loss:

                def pf(im):
                    y = module.apply({"params": params_}, im, method=module.g_a)
                    return module.apply(
                        {"params": params_}, y, method=module.g_s_phase
                    )

            return _attack_loss(
                af, x_, output_s_, n, cfg, clip_fn=cf, phase_fn=pf
            )

        loss_fn = remat_transform(cfg)(loss_fn)
        grad_fn = jax.grad(loss_fn, argnums=0, has_aux=True)

        # The scan body discards the primal/aux values, so XLA dead-code-
        # eliminates the primal forward: each step is (remat fwd + bwd),
        # not (primal fwd + remat fwd + bwd).  Carrying the loss history
        # keeps the primal alive and costs a full extra forward per step
        # (measured 138 vs 190 steps/s; trace shows 3 vs 2 cond bodies).
        def step(carry, lr):
            noise, opt_state = carry
            grads, _ = grad_fn(noise, params, x, loss_ref)
            updates, opt_state = opt.update(grads, opt_state)
            noise = noise + jax.tree_util.tree_map(lambda u: -lr * u, updates)
            return (noise, opt_state), None

        (noise, _), _ = jax.lax.scan(
            step, (noise0, opt_state0), lrs, unroll=cfg.scan_unroll
        )
        # final losses evaluated ONCE on the delivered noise (the reference
        # prints per-milestone losses; the result API exposes the finals)
        _, (loss_i_final, loss_o_final) = loss_fn(noise, params, x, loss_ref)

        eps = cfg.epsilon / 255.0
        noise_c = bound_clip(noise, -eps, eps)
        if cfg.debug_model:
            im_in = x + noise_c
        else:
            im_in = bound_clip(x + noise_c, 0.0, 1.0)

        defend_fn = defend_fn_builder(apply_fn) if defend_fn_builder else None
        ev = evaluate(
            apply_fn, im_in, x, output_s, clamp=cfg.clamp, defend_fn=defend_fn
        )
        ev.update(
            {
                "output_s": output_s,
                "bpp_ori": bpp_ori,
                "loss_i_final": loss_i_final,
                "loss_o_final": loss_o_final,
            }
        )
        return ev

    return jax.jit(attack)


def _make_split_attack_fn(module, cfg, lrs, opt, defend_fn_builder,
                          latent_transform):
    """Two-program variant of `make_attack_fn` (cfg.split_eval): program A
    runs the phase-space attack scan (no full-resolution narrow tensors at
    all — the clean decode is dead code and XLA eliminates it), program B
    runs the one-time full-resolution evaluation.  HBM peak is
    per-program, which is what puts the 12.6 MP attack on one chip
    (RESULTS.md round 3)."""
    if not cfg.phase_space_loss:
        raise ValueError("split_eval requires phase_space_loss=True")
    if cfg.defend_in_loop or cfg.pad or cfg.att_metric == "ms-ssim":
        raise ValueError(
            "split_eval supports the plain L2 attack only"
        )
    if cfg.debug_model:
        # the piecewise eval feeds im_in to the codec unclamped; with
        # debug_model (unclipped x+noise) that would silently diverge from
        # the single-program path's clamp-then-evaluate semantics
        raise ValueError("split_eval does not support debug_model")

    def attack_core(params, x, key: Optional[jax.Array] = None):
        apply_fn = lambda im, quant_mode: module.apply(
            {"params": params}, im, quant_mode=quant_mode
        )
        result_s = apply_fn(x, quant_mode="dequantize")
        num_pixels = x.shape[1] * x.shape[2]
        bpp_ori = bpp_from_likelihoods(result_s["likelihoods"], num_pixels)
        # phase-space clean reference; result_s["x_hat"] is never used, so
        # the full-res decode is DCE'd out of this program
        ref_y = result_s[getattr(module, "phase_reference_latent", "y_hat")]
        ref_ps = module.apply(
            {"params": params}, ref_y, method=module.g_s_phase
        )
        ref_ps = jnp.clip(ref_ps, 0.0, 1.0) if cfg.clamp else ref_ps
        # dense 2-D storage: zero layout padding as a scan invariant
        loss_ref = ref_ps.reshape(-1, ref_ps.shape[-1])

        noise0 = init_noise(x.shape, cfg, key)
        opt_state0 = opt.init(noise0)

        def loss_fn(n, params_, x_, output_s_):
            af = lambda im, quant_mode: module.apply(
                {"params": params_}, im, quant_mode=quant_mode
            )

            def pf(im):
                y = module.apply({"params": params_}, im, method=module.g_a)
                return module.apply(
                    {"params": params_}, y, method=module.g_s_phase
                )

            # nested checkpoint: without it the phase conv's blocked output
            # (1.51G at 12.6 MP, 10.7x layout pad) is held across the MSE
            # backward alongside its recompute — two instances at peak.
            # Checkpointing the decode keeps one alive at a time for one
            # extra decode per step.
            pf = jax.checkpoint(pf, prevent_cse=False)

            return _attack_loss(af, x_, output_s_, n, cfg, phase_fn=pf)

        loss_fn = remat_transform(cfg)(loss_fn)
        grad_fn = jax.grad(loss_fn, argnums=0, has_aux=True)

        def step(carry, lr):
            noise, opt_state = carry
            grads, _ = grad_fn(noise, params, x, loss_ref)
            updates, opt_state = opt.update(grads, opt_state)
            noise = noise + jax.tree_util.tree_map(lambda u: -lr * u, updates)
            return (noise, opt_state), None

        (noise, _), _ = jax.lax.scan(
            step, (noise0, opt_state0), lrs, unroll=cfg.scan_unroll
        )
        _, (loss_i_final, loss_o_final) = loss_fn(noise, params, x, loss_ref)

        eps = cfg.epsilon / 255.0
        noise_c = bound_clip(noise, -eps, eps)
        im_in = (x + noise_c if cfg.debug_model
                 else bound_clip(x + noise_c, 0.0, 1.0))
        return im_in, bpp_ori, loss_i_final, loss_o_final

    def eval_prog(params, x, im_in):
        apply_fn = lambda im, quant_mode: module.apply(
            {"params": params}, im, quant_mode=quant_mode
        )
        result_s = apply_fn(x, quant_mode="dequantize")
        output_s = (
            jnp.clip(result_s["x_hat"], 0.0, 1.0)
            if cfg.clamp else result_s["x_hat"]
        )
        defend_fn = defend_fn_builder(apply_fn) if defend_fn_builder else None
        ev = evaluate(
            apply_fn, im_in, x, output_s, clamp=cfg.clamp, defend_fn=defend_fn
        )
        ev["output_s"] = output_s
        return ev

    core_jit = jax.jit(attack_core)
    eval_jit = jax.jit(eval_prog)

    # piecewise evaluation (no eval-time defense only): each metric runs as
    # its OWN program so a single eval never has to fit two full-res
    # forwards + the MS-SSIM pyramid at once — at 12.6 MP the one-program
    # eval is the only remaining OOM (the attack core itself fits).
    def fwd_prog(params, im):
        result = module.apply({"params": params}, im, quant_mode="dequantize")
        x_hat = result["x_hat"]
        out = jnp.clip(x_hat, 0.0, 1.0) if cfg.clamp else x_hat
        num_pixels = im.shape[1] * im.shape[2]
        return out, bpp_from_likelihoods(result["likelihoods"], num_pixels)

    fwd_jit = jax.jit(fwd_prog)
    mse_jit = jax.jit(lambda a, b: jnp.mean((a - b) ** 2))
    msim_jit = jax.jit(ms_ssim)

    def attack(params, x, key: Optional[jax.Array] = None):
        im_in, bpp_ori, loss_i_final, loss_o_final = core_jit(params, x, key)
        # fence the two programs: the eval program must not be enqueued
        # while the core scan still holds its live temps — at 12.6 MP the
        # whole point of the split is that the per-PROGRAM peak fits
        # (RESULTS.md round-3 same-process caveat)
        im_in.block_until_ready()
        if defend_fn_builder is not None:
            ev = dict(eval_jit(params, x, im_in))
        else:
            from ..metrics import vi as vi_fn, vi_msim as vi_msim_fn

            output_s, _ = fwd_jit(params, x)
            output_, bpp = fwd_jit(params, im_in)
            mse_in = mse_jit(im_in, x)
            mse_out = mse_jit(output_, output_s)
            msim_in = msim_jit(im_in, x)
            msim_out = msim_jit(output_, output_s)
            ev = {
                "im_": im_in,
                "output_": output_,
                "output_s": output_s,
                "bpp": bpp,
                "mse_in": mse_in,
                "mse_out": mse_out,
                "msim_in": msim_in,
                "msim_out": msim_out,
                "vi": vi_fn(mse_in, mse_out),
                "vi_msim": vi_msim_fn(msim_in, msim_out),
            }
        ev.update(
            {
                "bpp_ori": bpp_ori,
                "loss_i_final": loss_i_final,
                "loss_o_final": loss_o_final,
            }
        )
        return ev

    attack.core_jit = core_jit  # exposed for stage-isolating probes
    attack.eval_jit = eval_jit
    return attack


def make_adv_example_fn(module, cfg: RDAttackConfig):
    """Attack-scan for adversarial TRAINING: (params, batch, noise_threshold,
    key) -> im_adv.

    Same loop as `make_attack_fn` but the input-budget threshold is a traced
    scalar (the reference ramps it over the first 100 training steps,
    `/root/reference/train.py:338-339` — no retrace per ramp value) and the
    post-attack evaluation is skipped: the training step consumes the raw
    adversarial batch (`train.py:342-347`).  Operates on full batches; the
    two-phase switch uses the batch-mean input loss, like the reference's
    scalar-mean loss on a batch tensor.
    """
    lrs = jnp.asarray(multistep_lr_schedule(cfg.steps, cfg.lr, cfg.lr_milgamma))
    opt = adam_on_noise()
    eps = cfg.epsilon / 255.0
    # same AUTO resolution as make_attack_fn (the training inner attack is
    # always the plain L2 one, so this is just the capability gate)
    use_phase = cfg.phase_space_loss
    supported = bool(getattr(module, "supports_phase_synthesis", False))
    if use_phase is None:
        use_phase = supported
    elif use_phase and not supported:
        raise ValueError(
            f"phase_space_loss=True but {type(module).__name__} declares no "
            "exact phase-space synthesis (supports_phase_synthesis is not set)"
        )

    def adv_example(params, x, noise_threshold, key=None):
        apply_fn = lambda im, quant_mode: module.apply(
            {"params": params}, im, quant_mode=quant_mode
        )
        result_s = apply_fn(x, quant_mode="dequantize")
        if use_phase:
            ref_y = result_s[getattr(module, "phase_reference_latent", "y_hat")]
            ref_ps = module.apply(
                {"params": params}, ref_y, method=module.g_s_phase
            )
            ref_ps = jnp.clip(ref_ps, 0.0, 1.0) if cfg.clamp else ref_ps
            output_s = ref_ps.reshape(-1, ref_ps.shape[-1])
        else:
            output_s = (
                jnp.clip(result_s["x_hat"], 0.0, 1.0)
                if cfg.clamp else result_s["x_hat"]
            )

        # args (not closures) for the checkpointed fn — see make_attack_fn
        def loss_fn(noise, params_, x_, output_s_, noise_threshold_):
            af = lambda im, quant_mode: module.apply(
                {"params": params_}, im, quant_mode=quant_mode
            )
            noise_c = bound_clip(noise, -eps, eps)
            im_in = bound_clip(x_ + noise_c, 0.0, 1.0)
            loss_i = jnp.mean((x_ - im_in) ** 2)

            def input_phase(_):
                return loss_i

            def output_phase(_):
                if use_phase:
                    y = module.apply(
                        {"params": params_}, im_in, method=module.g_a
                    )
                    ps = module.apply(
                        {"params": params_}, y, method=module.g_s_phase
                    )
                    output_ = bound_clip(ps, 0.0, 1.0) if cfg.clamp else ps
                    flat = output_.reshape(output_s_.shape)
                    return 1.0 - jnp.mean((output_s_ - flat) ** 2)
                out = af(im_in, quant_mode="none")
                x_hat = out["x_hat"]
                output_ = bound_clip(x_hat, 0.0, 1.0) if cfg.clamp else x_hat
                return 1.0 - jnp.mean((output_s_ - output_) ** 2)

            return jax.lax.cond(
                loss_i > noise_threshold_, input_phase, output_phase, None
            )

        noise0 = init_noise(x.shape, cfg, key)
        opt_state0 = opt.init(noise0)
        grad_fn = jax.grad(remat_transform(cfg)(loss_fn), argnums=0)

        def step(carry, lr):
            noise, opt_state = carry
            grads = grad_fn(noise, params, x, output_s, noise_threshold)
            updates, opt_state = opt.update(grads, opt_state)
            noise = noise + jax.tree_util.tree_map(lambda u: -lr * u, updates)
            return (noise, opt_state), None

        (noise, _), _ = jax.lax.scan(step, (noise0, opt_state0), lrs)
        return bound_clip(x + bound_clip(noise, -eps, eps), 0.0, 1.0)

    return adv_example


def make_batch_attack_fn(module, cfg: RDAttackConfig):
    """vmap the attack over a leading image axis (each element is its own
    independent Adam-on-noise run; `lax.cond` lowers to `select` under vmap,
    which is exactly the batched two-phase loss the reference stubbed out at
    `attack_rd.py:519-521`)."""
    if cfg.split_eval:
        raise ValueError("split_eval is not vmappable; use attack_batch=1")
    single = make_attack_fn(module, cfg)

    def batched(params, xs, keys=None):
        if keys is None:
            return jax.vmap(lambda x: single(params, x))(xs)
        return jax.vmap(lambda x, k: single(params, x, k))(xs, keys)

    return jax.jit(batched)


def best_of_restarts(attack_fn, params, x, keys, impl: str = "vmap"):
    """Random-restart wrapper: run `len(keys)` attacks and keep the
    highest-VI result (ref `attack_rd.py:658-664`).

    ``impl='host'`` loops the restarts on the host (sequential single-image
    programs) instead of vmapping them.  Use it when the vmapped program is
    too big for the chip: the fic 768x512 best-of-2 attack reproducibly
    dies with "TPU worker process crashed" (a libtpu fault, same class as
    the round-2 8-wide ensemble crash — RESULTS.md), while the sequential
    programs run fine.

    split_eval attacks (recognised by their exposed ``eval_jit`` stage) are
    ALWAYS host-looped: vmap would inline the two jitted subprograms into
    ONE traced computation, re-fusing the attack scan with the
    full-resolution eval and forfeiting the per-program HBM peak that
    split_eval exists to provide (e.g. a megapixel fic attack with
    ``-random 2`` would quietly reintroduce the OOM)."""
    if impl == "host" or getattr(attack_fn, "eval_jit", None) is not None:
        results = [attack_fn(params, x, k) for k in keys]
        best = max(range(len(results)), key=lambda i: float(results[i]["vi"]))
        return results[best]
    results = jax.vmap(lambda k: attack_fn(params, x, k))(keys)
    best = jnp.argmax(results["vi"])
    return jax.tree_util.tree_map(lambda a: a[best], results)
