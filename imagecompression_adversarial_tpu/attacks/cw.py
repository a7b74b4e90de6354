"""Carlini&Wagner-style constrained attack with double bisection.

Reference semantics (`/root/reference/attack_cw.py:115-263`):
  * joint loss ``loss_i + c * loss_o`` with ``loss_o = 1 - MSE(out, out_s)``;
    ``c`` is zeroed for any step where the achieved output distortion already
    exceeds ``1.1 x`` the target level
  * INNER bisection on the trade-off constant ``c in [0, lamb_attack]``: a
    fixed number of rounds (``search_steps``), each running ``steps`` Adam
    iterations on a noise variable that persists across rounds; after each
    round, ``c_l``/``c_r`` move based on whether the achieved distortion
    reached 99% of the target
  * OUTER bisection on the distortion target ``noise_level in [noise, 0.1]``
    driving the achieved input MSE toward the budget, with an early-stop
    when the input loss converges near the budget
  * `attack_cw_fast` variant: inner loop instead runs until the c-interval
    collapses (|c_r - c_l| <= tol).

TPU mapping (SURVEY §7.1): inner Adam loop -> `lax.scan`; inner bisection ->
`lax.scan` (fixed rounds) or `lax.while_loop` (fast variant); outer
bisection -> `lax.while_loop`.  Worst case ~ search_steps^2 * steps model
fwd+bwd passes, all inside one compiled program.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from ..metrics import bpp_from_likelihoods
from ..ops.bounds import bound_clip
from .common import adam_on_noise
from .evaluate import evaluate


@dataclasses.dataclass(frozen=True)
class CWAttackConfig:
    steps: int = 101  # Adam iterations per bisection round
    lr: float = 0.01
    noise_threshold: float = 1e-4  # `-noise` input budget
    epsilon: float = 16.0  # /255 clip on the noise variable
    lamb_attack: float = 0.2  # initial c upper bound (`-la`)
    search_steps: int = 20  # bisection rounds (`-ssteps`)
    clamp: bool = True
    fast: bool = False  # attack_cw_fast: run inner bisection to convergence
    c_tol: float = 1e-4  # fast-variant convergence tolerance on |c_r - c_l|


def make_cw_attack_fn(module, cfg: CWAttackConfig):
    """(params, x) -> evaluation dict with the double-bisection CW attack."""
    eps_inf = cfg.epsilon / 255.0
    opt = adam_on_noise()

    def attack(params, x):
        apply_fn = lambda im, quant_mode: module.apply(
            {"params": params}, im, quant_mode=quant_mode
        )
        result_s = apply_fn(x, quant_mode="dequantize")
        output_s = jnp.clip(result_s["x_hat"], 0.0, 1.0)
        num_pixels = x.shape[1] * x.shape[2]
        bpp_ori = bpp_from_likelihoods(result_s["likelihoods"], num_pixels)

        # remat: recompute-in-backward beats activation save/restore on v5e.
        # params/x/output_s enter as ARGUMENTS — jax.checkpoint
        # rematerializes closed-over tracers, and a closure over output_s
        # would re-run the clean forward every step.
        def cw_loss(noise, c, noise_level, params_, x_, output_s_):
            noise_c = bound_clip(noise, -eps_inf, eps_inf)
            im_in = bound_clip(x_ + noise_c, 0.0, 1.0)
            loss_i = jnp.mean((x_ - im_in) ** 2)
            out = module.apply({"params": params_}, im_in, quant_mode="none")
            output_ = bound_clip(out["x_hat"], 0.0, 1.0)
            loss_o = 1.0 - jnp.mean((output_s_ - output_) ** 2)
            c_eff = jnp.where(1.0 - loss_o > noise_level * 1.1, 0.0, c)
            return loss_i + c_eff * loss_o, (loss_i, loss_o)

        grad_fn = jax.grad(
            jax.checkpoint(cw_loss, prevent_cse=False), argnums=0, has_aux=True
        )

        def adam_round(noise, opt_state, c, noise_level):
            # aux discarded per step (XLA DCEs the primal forward — see
            # attacks/rd.py); the bisection needs only the ROUND's final
            # losses, computed once after the scan
            def adam_step(carry, _):
                noise, opt_state = carry
                grads, _ = grad_fn(noise, c, noise_level, params, x, output_s)
                updates, opt_state = opt.update(grads, opt_state)
                noise = noise + jax.tree_util.tree_map(
                    lambda u: -cfg.lr * u, updates
                )
                return (noise, opt_state), None

            (noise, opt_state), _ = jax.lax.scan(
                adam_step, (noise, opt_state), None, length=cfg.steps
            )
            _, (loss_i, loss_o) = cw_loss(
                noise, c, noise_level, params, x, output_s
            )
            return noise, opt_state, loss_i, loss_o

        def search_noise(noise_level):
            """Inner c-bisection (ref `search_noise`, `attack_cw.py:142-199`)."""
            noise0 = jnp.zeros_like(x)
            opt_state0 = opt.init(noise0)
            c_r0 = jnp.asarray(cfg.lamb_attack, jnp.float32)
            c_l0 = jnp.asarray(0.0, jnp.float32)

            def round_body(carry):
                noise, opt_state, c_l, c_r, c, _, _, it = carry
                noise, opt_state, loss_i, loss_o = adam_round(
                    noise, opt_state, c, noise_level
                )
                reached = 1.0 - loss_o < 0.99 * noise_level
                c_l = jnp.where(reached, c, c_l)
                c_r = jnp.where(reached, c_r, c)
                c = (c_r + c_l) / 2.0
                return (noise, opt_state, c_l, c_r, c, loss_i, loss_o, it + 1)

            init = (
                noise0, opt_state0, c_l0, c_r0, c_r0,
                jnp.asarray(0.0, jnp.float32), jnp.asarray(0.0, jnp.float32),
                jnp.asarray(0, jnp.int32),
            )
            if cfg.fast:
                carry = jax.lax.while_loop(
                    lambda cr: (jnp.abs(cr[3] - cr[2]) > cfg.c_tol)
                    & (cr[7] < cfg.search_steps * 4),
                    round_body,
                    init,
                )
            else:
                carry = jax.lax.fori_loop(
                    0, cfg.search_steps, lambda _, cr: round_body(cr), init
                )
            noise, _, _, _, _, loss_i, loss_o, _ = carry
            noise_c = bound_clip(noise, -eps_inf, eps_inf)
            im_in = bound_clip(x + noise_c, 0.0, 1.0)
            return loss_i, loss_o, im_in

        # outer bisection on the distortion target (ref `attack_cw.py:238-259`);
        # im_in is carried so the last search's adversarial input survives.
        max_n0 = jnp.asarray(0.1, jnp.float32)
        init = (
            jnp.asarray(cfg.noise_threshold, jnp.float32),
            max_n0,
            max_n0,
            jnp.asarray(0.0, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
        )

        def outer_body_full(carry):
            (min_n, max_n, noise_level, loss_i_prev, lp2, cnt, conv), im_prev = carry
            loss_i, loss_o, im_in = search_noise(noise_level)
            converged = (
                jnp.abs(loss_i - loss_i_prev) < cfg.noise_threshold * 0.01
            ) & (jnp.abs(loss_i - cfg.noise_threshold) < cfg.noise_threshold * 0.1)
            over = loss_i > cfg.noise_threshold
            max_n = jnp.where(over, noise_level, max_n)
            min_n = jnp.where(over, min_n, noise_level)
            new_level = (min_n + max_n) / 2.0
            return (
                (min_n, max_n, new_level, loss_i, loss_i_prev, cnt + 1, converged),
                im_in,
            )

        def outer_cond_full(carry):
            (min_n, max_n, noise_level, loss_i, lp, cnt, conv), _ = carry
            return (cnt < cfg.search_steps) & jnp.logical_not(conv)

        carry = jax.lax.while_loop(outer_cond_full, outer_body_full, (init, x))
        (_, _, _, loss_i, _, n_rounds, _), im_in = carry

        if not cfg.fast:
            # Post-hoc exact-budget amplitude search (ref `attack_cw.py:44-54`,
            # absent from attack_cw_fast): bisect a scalar cap on |noise| until
            # the clamped noise's MSE meets the input budget (interval 1/256),
            # then report the capped adversarial input so mse_in never
            # overshoots the budget by more than one 8-bit quantization step.
            noise_f = im_in - x

            def amp_cond(c):
                min_n, max_n = c
                return jnp.abs(min_n - max_n) > 1.0 / 256.0

            def amp_body(c):
                min_n, max_n = c
                mid = (min_n + max_n) / 2.0
                capped_mse = jnp.mean(jnp.clip(noise_f, -mid, mid) ** 2)
                over = capped_mse > cfg.noise_threshold
                # over budget -> shrink the cap; else grow the floor (ref :48-51)
                return jnp.where(over, min_n, mid), jnp.where(over, mid, max_n)

            _, max_n = jax.lax.while_loop(
                amp_cond,
                amp_body,
                (jnp.asarray(0.0, jnp.float32), jnp.max(jnp.abs(noise_f))),
            )
            im_in = x + jnp.clip(noise_f, -max_n, max_n)

        ev = evaluate(apply_fn, im_in, x, output_s, clamp=cfg.clamp)
        ev.update(
            {
                "output_s": output_s,
                "bpp_ori": bpp_ori,
                "loss_i_final": loss_i,
                "outer_rounds": n_rounds,
            }
        )
        return ev

    return jax.jit(attack)
