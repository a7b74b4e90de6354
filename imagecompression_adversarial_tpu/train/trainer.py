"""Training orchestration: standard RD training, adversarial finetuning,
recompression-regularized training.

Reference flow being reproduced (`/root/reference/train.py:249-497`):
  * per-quality lambda (or explicit ``-lamb``); 200 epochs (100 adversarial)
  * --adv: per-batch inner RD attack with a noise-budget curriculum ramp over
    the first 100 steps, RD update on the adversarial batch, eval-by-attack
    every 10 steps (budget forced to 1e-4), hard stop at step 2000
  * --recompress: latent-stability loss, eval every 1000 steps
  * otherwise eval every 10000 steps and at epoch end
  * ReduceLROnPlateau(factor 0.5) on the eval loss, best-loss checkpointing.

TPU-first: one jitted train step (attack scan embedded for --adv via
`make_adv_example_fn` — scan-in-step, SURVEY §7.1); batches are sharded over
the dp mesh axis when more than one device is visible.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..attacks.common import RDAttackConfig
from ..attacks.rd import make_adv_example_fn, make_attack_fn
from ..config import Config
from ..runtime import load_model
from .checkpoint import CheckpointManager, ckpt_dir_for
from .data import augment_dihedral, make_batches, prefetch
from .loss import lambda_for, rate_distortion_loss
from .step import ReduceLROnPlateau, create_train_state


def _append_curve(log_path: Optional[str], record: dict) -> None:
    """Append one JSONL training-curve record (the reference's append-only
    text log, `train.py:232-235`, in a machine-readable form)."""
    if not log_path:
        return
    import json
    import os

    os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
    with open(log_path, "a") as f:
        f.write(json.dumps(record) + "\n")


def train(cfg: Config, data_root: Optional[str] = None,
          max_steps: Optional[int] = None, crop: int = 256,
          augment: bool = False) -> dict:
    """Run training per config; returns summary stats (for tests/CLI)."""
    module, params = load_model(cfg)
    lamb = cfg.lamb if cfg.lamb is not None else lambda_for(cfg.metric, cfg.quality)
    print(f"Lambda: {lamb}")
    print(f"Learning rate (training): {cfg.lr_train}")

    state, train_step = create_train_state(module, params)
    sched = ReduceLROnPlateau(cfg.lr_train)

    epochs_num = cfg.epochs or (100 if cfg.adv else 200)  # ref train.py:271
    if cfg.debug:
        epochs_num = min(epochs_num, 2)
    ckpt_dir = ckpt_dir_for(cfg, lamb)
    print(f"Save ckpts to: {ckpt_dir}")
    ckpts = CheckpointManager(ckpt_dir)

    # resume
    restored, extra = ckpts.restore(state)
    start_epoch = 0
    if restored is not None:
        state = restored
        start_epoch = int(extra.get("epoch", 0)) + 1
        sched.lr = float(extra.get("lr", cfg.lr_train))
        print(f"resume training from epoch {start_epoch}")

    # adversarial-example generator embedded in the step
    adv_cfg = RDAttackConfig(
        steps=cfg.steps, lr=cfg.lr_attack, epsilon=cfg.epsilon, clamp=cfg.clamp
    )
    adv_example = make_adv_example_fn(module, adv_cfg) if cfg.adv else None

    jitted_step = jax.jit(
        lambda s, b, r, lr: train_step(
            s, b, r, lr, lamb, cfg.metric, recompress=bool(cfg.recompress)
        )
    )
    if cfg.adv:
        jitted_adv = jax.jit(adv_example)

    # held-out eval batch (deterministic)
    eval_batches = make_batches(data_root, cfg.batch_size, crop=crop, seed=999)
    eval_batch = jnp.asarray(next(eval_batches))

    eval_attack = None
    if cfg.adv:
        eval_attack = make_attack_fn(
            module,
            RDAttackConfig(steps=cfg.steps, lr=cfg.lr_attack,
                           noise_threshold=1e-4, epsilon=cfg.epsilon,
                           clamp=cfg.clamp),
        )

    def test_epoch(params) -> float:
        """Eval loss — adversarial mode returns mean VI under a fresh attack
        with the budget forced to 1e-4 (ref `train.py:205-214`)."""
        if cfg.adv:
            res = eval_attack(params, eval_batch)
            return float(res["vi"])
        result = module.apply(
            {"params": params}, eval_batch, quant_mode="noise",
            rngs={"quant": jax.random.PRNGKey(0)},
        )
        out = rate_distortion_loss(result, eval_batch, lamb, cfg.metric)
        return float(out["loss"])

    best_loss = float("inf")
    rng = jax.random.PRNGKey(42)
    noise_range = cfg.noise
    global_step = int(state.step)
    trace_step = global_step + 1  # 2nd step: compile already cached
    logs = {}
    stop = False
    epoch = start_epoch

    train_stream = make_batches(data_root, cfg.batch_size, crop=crop)
    if augment:
        # dihedral augmentation (flips + rot90) — required for the geometric
        # self-ensemble defense to be effective (RESULTS.md)
        train_stream = augment_dihedral(train_stream)
    batches = prefetch(train_stream)
    t0 = time.time()
    for epoch in range(start_epoch, epochs_num):
        for batch_np in batches:
            batch = jnp.asarray(batch_np)
            rng, step_rng, adv_rng = jax.random.split(rng, 3)

            if cfg.adv:
                # curriculum ramp (ref `train.py:338-339`)
                thresh = noise_range * min(global_step, 100) / 100.0
                batch = jitted_adv(state.params, batch, jnp.float32(thresh))

            if cfg.trace and global_step == trace_step:
                # -trace: profile one steady-state step (compile cached)
                with jax.profiler.trace(cfg.trace):
                    state, logs = jitted_step(
                        state, batch, step_rng, jnp.float32(sched.lr)
                    )
                    jax.block_until_ready(logs["loss"])
                print(f"[trace] jax.profiler trace written to {cfg.trace}")
            else:
                if not logs:  # first call: compile blocks for minutes on big families
                    print("compiling train step (first batch)...", flush=True)
                state, logs = jitted_step(state, batch, step_rng, jnp.float32(sched.lr))
            global_step += 1

            # light progress line between (expensive) eval points, so short
            # demo runs don't sit silent for their whole duration
            if global_step % 200 == 0:
                print(
                    f"step: {global_step} loss: {float(logs['loss']):.4f} "
                    f"t: {time.time() - t0:.1f}s", flush=True,
                )

            # NOTE --adv eval cost: eval_attack compiles ONCE (jitted), but
            # each eval still RUNS a full cfg.steps-iteration attack on the
            # held-out batch — with the default 1001 steps that is ~100x a
            # train step every 10 steps; use smaller -steps for smoke runs.
            eval_every = 10 if cfg.adv else (1000 if cfg.recompress else 10000)
            if global_step % eval_every == 0:
                loss = test_epoch(state.params)
                lr = sched.step(loss)
                is_best = loss < best_loss
                best_loss = min(loss, best_loss)
                print(
                    f"step: {global_step} loss: {float(logs['loss']):.4f} "
                    f"distortion: {float(logs['distortion']):.6f} "
                    f"rate: {float(logs['bpp_loss']):.4f} lr: {lr:g} "
                    f"eval: {loss:.4f} t: {time.time() - t0:.1f}s"
                )
                _append_curve(cfg.log, {
                    "step": global_step, "loss": float(logs["loss"]),
                    "distortion": float(logs["distortion"]),
                    "bpp": float(logs["bpp_loss"]), "lr": lr,
                    "eval_loss": loss, "t": round(time.time() - t0, 2),
                })
                ckpts.save(
                    global_step, state,
                    extra={"epoch": epoch, "loss": loss, "lr": sched.lr},
                    is_best=is_best,
                )

            if cfg.adv and global_step >= 2000:  # hard stop (ref `train.py:455`)
                stop = True
            if max_steps is not None and global_step >= max_steps:
                stop = True
            if stop:
                break
        if stop:
            break

        if not cfg.adv:
            loss = test_epoch(state.params)
            sched.step(loss)
            is_best = loss < best_loss
            best_loss = min(loss, best_loss)
            ckpts.save(global_step, state,
                       extra={"epoch": epoch, "loss": loss, "lr": sched.lr},
                       is_best=is_best)

    # final checkpoint so short runs (max_steps < eval cadence) still persist;
    # a mid-epoch stop records epoch-1 so resume re-enters the same epoch
    if global_step > 0 and ckpts.latest_step() != global_step:
        loss = test_epoch(state.params)
        is_best = loss < best_loss
        best_loss = min(loss, best_loss)
        ckpts.save(global_step, state,
                   extra={"epoch": (epoch - 1) if stop else epoch,
                          "loss": loss, "lr": sched.lr},
                   is_best=is_best)

    final = {
        "steps": global_step,
        "loss": float(logs.get("loss", np.nan)) if logs else None,
        "best_loss": best_loss,
        "ckpt_dir": ckpt_dir,
    }
    ckpts.close()
    return final
