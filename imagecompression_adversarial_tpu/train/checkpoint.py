"""Orbax checkpointing of the training state (SURVEY §5 checkpoint/resume).

Reference behaviour being matched (`/root/reference/train.py:244-247,
416-497`, `coder.py:127-135`): checkpoints carry
{epoch, step, params, both optimizer states, scheduler state, loss}; the
best checkpoint is duplicated as ``best_loss``; the directory scheme is
``./ckpts/{anchor|adv|recompress}/{model}-{lambda}-{metric}[...]``; resume
restores everything.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .step import TrainState


def ckpt_dir_for(cfg, lamb: float) -> str:
    """Reference directory scheme (`train.py:270-284`)."""
    if lamb in (100, 1):
        model_dir = f"{cfg.model}-Inf-{cfg.metric}"
    else:
        model_dir = f"{cfg.model}-{lamb}-{cfg.metric}"
    if cfg.adv:
        model_dir += f"-{cfg.noise}-{cfg.steps}"
        return os.path.abspath(f"./ckpts/adv/{model_dir}")
    if cfg.recompress:
        model_dir += f"-x{cfg.recompress}"
        return os.path.abspath(f"./ckpts/recompress/{model_dir}")
    return os.path.abspath(f"./ckpts/anchor/{model_dir}")


class CheckpointManager:
    """Thin orbax wrapper: numbered steps + a mirrored ``best`` save."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._best = ocp.StandardCheckpointer()

    def save(
        self,
        step: int,
        state: TrainState,
        extra: Optional[Dict[str, Any]] = None,
        is_best: bool = False,
    ):
        payload = {
            "state": jax.tree_util.tree_map(np.asarray, {
                "params": state.params,
                "opt_state": state.opt_state,
                "aux_opt_state": state.aux_opt_state,
                "step": state.step,
            }),
            "extra": extra or {},
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()
        if is_best:
            best_path = os.path.join(self.directory, "best_loss")
            if os.path.exists(best_path):
                import shutil

                shutil.rmtree(best_path)
            self._best.save(best_path, payload)
            self._best.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: TrainState, step: Optional[int] = None):
        """Restore (TrainState, extra) from the latest (or given) step."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None, None
        template = {
            "state": {
                "params": state_template.params,
                "opt_state": state_template.opt_state,
                "aux_opt_state": state_template.aux_opt_state,
                "step": state_template.step,
            },
            "extra": {"epoch": 0, "loss": 0.0, "lr": 0.0},
        }
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        s = restored["state"]
        state = TrainState(
            params=s["params"],
            opt_state=s["opt_state"],
            aux_opt_state=s["aux_opt_state"],
            step=s["step"],
        )
        return state, restored.get("extra", {})

    def close(self):
        self._mgr.close()
