"""Sign-gradient attack family: I-FGSM/BIM, PGD, MI-FGSM.

Reference semantics (`/root/reference/attack_ifgsm.py:348-438`):
  * objective: output distortion ``MSE(g_s(g_a(im_adv)), out_clean)``
    through the quantization-free path, ascended by its input gradient
  * BIM: ``im_adv += (eps/steps) * sign(grad)``
  * PGD: BIM from a uniform(+-eps) random start (clamped to [0,1] at init)
  * MI-FGSM: momentum ``g = g + grad/||grad||_1``, step ``alpha*sign(g)``
    followed by a [0,1] clamp
  * every step projects back into the eps-ball around the clean image
  * multi-start keeps the best-VI run.

One jitted `lax.scan`; multi-start is a vmapped axis.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .evaluate import evaluate


@dataclasses.dataclass(frozen=True)
class IFGSMConfig:
    steps: int = 101
    epsilon: float = 16.0  # /255 L-inf budget
    random_start: bool = False  # PGD
    momentum: bool = False  # MI-FGSM
    clamp: bool = True
    # phase-space loss (see attacks/common.py RDAttackConfig): the loss MSE
    # — and therefore its input gradient and every sign-gradient step — is
    # invariant under the depth-to-space permutation.  None = auto.
    phase_space_loss: Optional[bool] = None


def make_ifgsm_fn(module, cfg: IFGSMConfig):
    """(params, x, key?) -> evaluation dict, fully jitted."""
    eps = cfg.epsilon / 255.0
    alpha = eps / cfg.steps
    use_phase = cfg.phase_space_loss
    supported = bool(getattr(module, "supports_phase_synthesis", False))
    if use_phase is None:
        use_phase = supported
    elif use_phase and not supported:
        raise ValueError(
            f"phase_space_loss=True but {type(module).__name__} declares no "
            "exact phase-space synthesis (supports_phase_synthesis is not set)"
        )

    def attack(params, x, key: Optional[jax.Array] = None):
        apply_fn = lambda im, quant_mode: module.apply(
            {"params": params}, im, quant_mode=quant_mode
        )
        result_s = apply_fn(x, quant_mode="dequantize")
        output_s = jnp.clip(result_s["x_hat"], 0.0, 1.0)

        from ..metrics import bpp_from_likelihoods

        num_pixels = x.shape[1] * x.shape[2]
        bpp_ori = bpp_from_likelihoods(result_s["likelihoods"], num_pixels)

        if cfg.random_start:
            assert key is not None, "PGD random start needs a PRNG key"
            im0 = jnp.clip(
                x + jax.random.uniform(key, x.shape, x.dtype, -eps, eps), 0.0, 1.0
            )
        else:
            im0 = x

        if use_phase:
            # clean loss reference in phase space (dense 2-D storage);
            # clip is elementwise so clamping in phase space == clamping
            # after depth-to-space
            ref_y = result_s[getattr(module, "phase_reference_latent", "y_hat")]
            ref_ps = module.apply(
                {"params": params}, ref_y, method=module.g_s_phase
            )
            loss_ref = jnp.clip(ref_ps, 0.0, 1.0).reshape(-1, ref_ps.shape[-1])
        else:
            loss_ref = output_s

        # remat: the backward is activation-HBM-bound, recompute wins on v5e
        # (scripts/perf_attack_variants.py).  params/output_s enter as
        # ARGUMENTS — jax.checkpoint rematerializes closed-over tracers, and
        # a closure over output_s would re-run the clean forward every step.
        def loss_o_fn(im_adv, params_, output_s_):
            if use_phase:
                y = module.apply(
                    {"params": params_}, im_adv, method=module.g_a
                )
                ps = module.apply(
                    {"params": params_}, y, method=module.g_s_phase
                )
                return jnp.mean((output_s_ - ps.reshape(output_s_.shape)) ** 2)
            out = module.apply(
                {"params": params_}, im_adv, quant_mode="none"
            )
            return jnp.mean((output_s_ - out["x_hat"]) ** 2)

        grad_fn = jax.grad(
            jax.checkpoint(loss_o_fn, prevent_cse=False), argnums=0
        )

        def step(carry, _):
            im_adv, g = carry
            grad = grad_fn(im_adv, params, loss_ref)
            if cfg.momentum:
                g = g + grad / jnp.sum(jnp.abs(grad))
                im_adv = jnp.clip(im_adv + alpha * jnp.sign(g), 0.0, 1.0)
            else:
                im_adv = im_adv + alpha * jnp.sign(grad)
            # project to the eps-ball around the clean image
            im_adv = jnp.clip(im_adv, x - eps, x + eps)
            return (im_adv, g), None

        (im_adv, _), _ = jax.lax.scan(
            step, (im0, jnp.zeros_like(x)), None, length=cfg.steps
        )

        ev = evaluate(apply_fn, im_adv, x, output_s, clamp=cfg.clamp)
        ev.update({"output_s": output_s, "bpp_ori": bpp_ori})
        return ev

    return jax.jit(attack)


def best_of_multistart(attack_fn, params, x, keys):
    """Multi-start best-of-VI (ref `attack_ifgsm.py:432-437`), sequential.

    Starts run one at a time, reusing a single compiled executable.
    vmapping the whole 1001-step attack multiplies live HBM by n_starts
    and crashes the v5e worker at 768x512 (and is slower anyway — the
    chip is already saturated by one attack).
    """
    best_vi, best_res = -float("inf"), None
    for k in list(keys):
        res = attack_fn(params, x, k)
        vi = float(res["vi"])
        if vi > best_vi:
            best_vi, best_res = vi, res
    return best_res
