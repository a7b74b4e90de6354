"""Targeted / ROI attacks: drive the reconstruction toward a target image,
a target region, or a classifier label.

Reference behaviour (`/root/reference/attack_cv.py:28-343`,
`attack_data.py:44-243`):
  * targeted: ``loss_o = MSE(output, target_image)`` (or L1), minimized --
    the decoder is steered to reconstruct the target instead of the input
  * ROI: a bounding-box mask (``--mask_loc x0 x1 y0 y1``) splits the image
    into target and background regions weighted by ``-la_tar``,
    ``-la_bkg_in``, ``-la_bkg_out`` (flag surface per `coder.py:200-203`)
  * classifier: cross-entropy toward a chosen label through an MNIST-style
    MLP on the reconstruction (`attack_cv.py:232-234`)
  * same Adam-on-noise loop with noise range 0.5 and the two-phase budget
    switch (`attack_cv.py:199-208`, `attack_data.py:223-226`).

Same single-scan TPU structure as `attacks.rd`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..metrics import bpp_from_likelihoods
from ..ops.bounds import bound_clip
from .common import adam_on_noise, multistep_lr_schedule
from .evaluate import evaluate


@dataclasses.dataclass(frozen=True)
class TargetedAttackConfig:
    steps: int = 1001
    lr: float = 0.01
    noise_threshold: float = 1e-4
    noise_range: float = 0.5  # attack_cv uses 0.5, not eps/255 (ref :200)
    att_metric: str = "L2"  # 'L2' | 'L1' | 'masked'
    clamp: bool = True
    lamb_tar: float = 1.0
    lamb_bkg_in: float = 1.0
    lamb_bkg_out: float = 1.0
    mask_loc: Optional[Tuple[int, int, int, int]] = None  # x0, x1, y0, y1
    lr_milgamma: float = 0.33


def roi_masks(shape, mask_loc) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mask_tar, mask_bkg) NHWC from an (x0, x1, y0, y1) box
    (ref `attack_cv.py:153-163`: box indexed [y0:y1, x0:x1])."""
    x0, x1, y0, y1 = mask_loc
    mask_bkg = jnp.ones(shape, jnp.float32)
    mask_bkg = mask_bkg.at[:, y0:y1, x0:x1, :].set(0.0)
    return 1.0 - mask_bkg, mask_bkg


def make_targeted_attack_fn(
    module,
    cfg: TargetedAttackConfig,
    classifier_logits_fn: Optional[Callable] = None,
    target_label: Optional[int] = None,
):
    """(params, x, target_image?) -> eval dict.

    * ``target_image`` given -> image-targeted (optionally ROI-masked) attack
    * ``classifier_logits_fn`` + ``target_label`` -> CE-targeted attack
    * neither -> untargeted distortion attack vs the input itself
      (attack_data's ``1 - MSE(im_s, output)``, `attack_data.py:206`).
    """
    lrs = jnp.asarray(multistep_lr_schedule(cfg.steps, cfg.lr, cfg.lr_milgamma))
    opt = adam_on_noise()

    def attack(params, x, target_image: Optional[jax.Array] = None):
        apply_fn = lambda im, quant_mode: module.apply(
            {"params": params}, im, quant_mode=quant_mode
        )
        result_s = apply_fn(x, quant_mode="dequantize")
        output_s = jnp.clip(result_s["x_hat"], 0.0, 1.0)
        num_pixels = x.shape[1] * x.shape[2]
        bpp_ori = bpp_from_likelihoods(result_s["likelihoods"], num_pixels)

        if cfg.mask_loc is not None:
            mask_tar, mask_bkg = roi_masks(x.shape, cfg.mask_loc)
        else:
            mask_tar = jnp.ones_like(x)
            mask_bkg = jnp.zeros_like(x)

        # params/x/output_s enter as ARGUMENTS — jax.checkpoint
        # rematerializes closed-over tracers (a closure over output_s would
        # re-run the clean forward every backward step)
        def loss_fn(noise, params_, x_, output_s_):
            noise_c = bound_clip(noise, -cfg.noise_range, cfg.noise_range)
            im_in = bound_clip(x_ + noise_c, 0.0, 1.0)
            out = module.apply({"params": params_}, im_in, quant_mode="none")
            x_hat_ = out["x_hat"]
            output_ = bound_clip(x_hat_, 0.0, 1.0) if cfg.clamp else x_hat_

            if cfg.att_metric == "L1":
                diff_in = jnp.abs(im_in - x_)
                diff_fn = lambda a, b: jnp.abs(a - b)
            else:
                diff_in = (im_in - x_) ** 2
                diff_fn = lambda a, b: (a - b) ** 2

            loss_i = cfg.lamb_tar * jnp.mean(diff_in * mask_tar) + (
                cfg.lamb_bkg_in * jnp.mean(diff_in * mask_bkg)
            )

            if classifier_logits_fn is not None:
                logits = classifier_logits_fn(output_)
                label = jnp.asarray([target_label])
                loss_o = jnp.mean(
                    -jax.nn.log_softmax(logits)[
                        jnp.arange(logits.shape[0]), label
                    ]
                )
            elif target_image is not None:
                loss_o = cfg.lamb_tar * jnp.mean(
                    diff_fn(output_, target_image) * mask_tar
                ) + cfg.lamb_bkg_out * jnp.mean(diff_fn(output_, output_s_) * mask_bkg)
            else:
                loss_o = 1.0 - jnp.mean(diff_fn(x_, output_))

            loss = jax.lax.cond(
                loss_i >= cfg.noise_threshold,
                lambda _: loss_i,
                lambda _: loss_o,
                None,
            )
            return loss, (loss_i, loss_o)

        # remat: recompute-in-backward beats activation save/restore on v5e
        grad_fn = jax.grad(
            jax.checkpoint(loss_fn, prevent_cse=False), argnums=0, has_aux=True
        )
        noise0 = jnp.zeros_like(x)
        opt_state0 = opt.init(noise0)

        # aux discarded in the scan so XLA DCEs the primal forward (one
        # fewer forward per step — see attacks/rd.py); finals computed once
        def step(carry, lr):
            noise, opt_state = carry
            grads, _ = grad_fn(noise, params, x, output_s)
            updates, opt_state = opt.update(grads, opt_state)
            noise = noise + jax.tree_util.tree_map(lambda u: -lr * u, updates)
            return (noise, opt_state), None

        (noise, _), _ = jax.lax.scan(step, (noise0, opt_state0), lrs)
        _, (loss_i_final, loss_o_final) = loss_fn(noise, params, x, output_s)
        im_in = bound_clip(
            x + bound_clip(noise, -cfg.noise_range, cfg.noise_range), 0.0, 1.0
        )

        ev = evaluate(apply_fn, im_in, x, output_s, clamp=cfg.clamp)
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
