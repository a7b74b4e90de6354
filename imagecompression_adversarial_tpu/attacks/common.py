"""Shared attack plumbing: configs, LR schedules, Adam-on-noise updates.

The reference optimizes a noise tensor with torch Adam lr=0.01 and a
MultiStepLR(milestones=[1,2,3], gamma=0.33) stepped every ``steps // 3``
iterations (`/root/reference/attack_rd.py:502-503,553-554`).  On TPU the
whole loop is one jitted `lax.scan`; the LR trajectory is precomputed
host-side and scanned over, which reproduces torch's
step-then-maybe-decay ordering exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass(frozen=True)
class RDAttackConfig:
    """Knobs of the canonical RD distortion attack (ref `coder.py:191-210`)."""

    steps: int = 1001
    lr: float = 0.01
    noise_threshold: float = 1e-4  # L2 input budget (`-noise`)
    epsilon: float = 16.0  # L-inf budget in /255 units (`-e`)
    att_metric: str = "L2"  # 'L2' | 'ms-ssim'
    clamp: bool = True  # `--no-clamp` clears this
    random_restarts: int = 1  # `-random`
    lr_milgamma: float = 0.33
    debug_model: bool = False  # reference 'debug' arch skips [0,1] clamp
    # adaptive attack: optimize THROUGH the defense (ref
    # `self_ensemble.py:254-274` with --adv)
    defend_in_loop: Optional[str] = None  # None|'ensemble'|'resize'|'bitdepth'|'clip'
    # how the in-loop ensemble evaluates its 8 dihedral variants:
    # 'scan' = sequential per-variant checkpointed forwards (one variant's
    # activations live at a time — survives full-Kodak adaptive attacks that
    # fault libtpu with the 8-wide remat'd batch backward, round-2 RESULTS);
    # 'batch' = two 4-variant batched forwards (round-2 behaviour)
    ensemble_impl: str = "scan"
    # reflect-pad the clean forward by this many pixels, cropping the
    # reference output back (ref `-p` flag, `attack_rd.py:390-417`)
    pad: Optional[int] = None
    padding_mode: str = "reflect"
    # rematerialize the loss in the backward pass: measured +5% attack
    # throughput on v5e (activation HBM traffic dominates the backward;
    # scripts/perf_attack_variants.py, RESULTS.md round 2)
    remat: bool = True
    # 'full'    — save nothing, recompute the whole forward in the backward
    # 'latents' — save only the checkpoint_name'd 16x-downsampled latents
    #             (models/codecs.py), so the decoder backward recomputes
    #             g_s from y_hat instead of re-running g_a+hyper first
    remat_policy: str = "full"
    # lax.scan unroll factor for the attack loop (compile time scales with
    # it; >1 measured within noise of 1 on the full attack)
    scan_unroll: int = 1
    # evaluate the output-distortion loss in PHASE SPACE (the final deconv's
    # subpixel form, no depth-to-space): MSE is invariant under the d2s
    # permutation, and the hot loop then never materializes a
    # full-resolution 3-channel tensor — whose conv-backward layout pads
    # 21-64x on TPU (the 12.6 MP OOM, RESULTS.md round 3; +12% attack
    # throughput at bench size, 210 vs 188 steps/s).  None = AUTO: on
    # whenever the attack is the plain L2 one (no ms-ssim metric, in-loop
    # defense, or -p pad) and the codec declares an exact phase synthesis
    # (`supports_phase_synthesis`, models/codecs.py).  True forces it
    # (raises if the codec has none); False forces the full-res loss.
    phase_space_loss: Optional[bool] = None
    # compile the attack scan and the final evaluation as SEPARATE XLA
    # programs (two jits instead of one).  HBM peak is per-program, so the
    # scan's rematerialized backward and the eval's full-resolution
    # forwards (incl. the 21x-padded narrow-tensor conv temps and the
    # MS-SSIM pyramid) no longer stack — the second half of the 12.6 MP
    # single-chip fix.  Requires phase_space_loss (the scan must not
    # reference the full-res clean output).  Not vmappable.
    split_eval: bool = False
    # how the two-phase loss branches (ref `attack_rd.py:332-379`):
    # 'cond'   — lax.cond skips the forward on over-budget steps (round-1
    #            choice; XLA conds insert operand copies each step — the
    #            round-5 trace shows 48 copies/step, 1.26 ms/step busy)
    # 'select' — always run the output phase, scalar jnp.where blend (the
    #            lowering vmap produces anyway; after the first few steps
    #            the attack is in the output phase at every step, so the
    #            skipped forward never pays for the cond plumbing)
    two_phase_impl: str = "cond"


def remat_transform(cfg: "RDAttackConfig"):
    """(loss_fn -> loss_fn) applying the configured rematerialization.

    prevent_cse=False throughout: the grad is always taken inside a
    `lax.scan` body, where CSE-prevention is unnecessary (JAX docs) and
    letting XLA CSE the recomputed forward measures slightly faster
    (190.3 vs 189.7 steps/s, scripts/perf_remat_policies.py)."""
    if not cfg.remat:
        return lambda f: f
    if cfg.remat_policy == "latents":
        policy = jax.checkpoint_policies.save_only_these_names(
            "latent", "latent_hat", "hyper_out"
        )
        return lambda f: jax.checkpoint(f, policy=policy, prevent_cse=False)
    return lambda f: jax.checkpoint(f, prevent_cse=False)


def multistep_lr_schedule(
    steps: int, base_lr: float, gamma: float = 0.33, n_decays: int = 3
) -> np.ndarray:
    """Per-iteration LR reproducing torch MultiStepLR([1,2,3], gamma) stepped
    at every ``i % (steps//3) == 0`` boundary (decay takes effect from the
    *next* iteration; milestones cap the number of decays at 3)."""
    d = max(steps // 3, 1)
    lrs = np.empty(steps, np.float64)
    factor = 1.0
    epoch = 0
    for i in range(steps):
        lrs[i] = base_lr * factor
        if i % d == 0:  # scheduler.step() happens after optimizer.step()
            epoch += 1
            if epoch <= n_decays:
                factor *= gamma
    return lrs.astype(np.float32)


def adam_on_noise(
    eps: float = 1e-8, b1: float = 0.9, b2: float = 0.999
) -> optax.GradientTransformation:
    """torch-equivalent Adam direction (bias-corrected, eps outside sqrt)."""
    return optax.scale_by_adam(b1=b1, b2=b2, eps=eps, eps_root=0.0)


def init_noise(
    shape: Tuple[int, ...],
    cfg: RDAttackConfig,
    key: Optional[jax.Array],
) -> jax.Array:
    """Initial noise variable (ref `attack_rd.py:493-499`): zeros normally,
    uniform(-1e-2, 1e-2) for random restarts, uniform(±sqrt(budget)) for the
    debug fixture."""
    if cfg.debug_model:
        assert key is not None
        a = float(np.sqrt(cfg.noise_threshold))
        return jax.random.uniform(key, shape, jnp.float32, -a, a)
    if cfg.random_restarts > 1:
        assert key is not None
        return jax.random.uniform(key, shape, jnp.float32, -1e-2, 1e-2)
    return jnp.zeros(shape, jnp.float32)


def make_phase_fwd_scan(module, steps: int):
    """Forward-only scan of the RD attack's ACTUAL in-loop computation —
    g_a + the phase-space synthesis, no hyper path, no likelihoods — the
    honest throughput floor for the attack (a full fwd+bwd step can never
    beat it).  Shared by bench.py's sanity cross-check and
    scripts/perf_two_phase.py so the two cannot drift.  The scan is
    sequentialized through the image-shaped noise carry (updated from the
    output mean) so XLA cannot hoist the loop-invariant forward (the
    round-2 DCE trap, CLAUDE.md)."""
    import jax

    def scan(params, x):
        def step(n, _):
            y = module.apply({"params": params}, x + n, method=module.g_a)
            out = module.apply({"params": params}, y, method=module.g_s_phase)
            return n + 1e-6 * jnp.mean(out), None

        return jax.lax.scan(
            step, jnp.zeros_like(x), None, length=steps
        )[0]

    return scan
