"""Training state and jitted train step (main + auxiliary optimizers).

Reference mechanics being reproduced (`/root/reference/train.py:249-497`,
`coder.py:50-86`):
  * main Adam over every parameter except the entropy-bottleneck
    ``quantiles``; auxiliary Adam (lr 1e-3) over exactly the ``quantiles``
  * grad-norm clip 1.0 before the main Adam
  * ReduceLROnPlateau drives the main LR -> it enters the jitted step as a
    traced scalar (no retrace when the scheduler halves it)
  * rate-distortion loss with per-quality lambda; aux loss from the
    quantile CDF fit; optional recompression regularizer.

TPU-first: both optimizers live in one pjit-able ``train_step``; under a
data-parallel mesh the gradient reductions become XLA psums (batch sharded
along 'dp', params replicated) — the collective layer the reference never
had (SURVEY §2.7).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .loss import rate_distortion_loss


def quantile_labels(params) -> Any:
    """Label pytree: 'aux' exactly on leaves named 'quantiles', else 'main'.
    Disjoint by construction (the reference asserts the same split,
    `coder.py:74-76`)."""

    def label(path, _):
        last = path[-1]
        key = getattr(last, "key", getattr(last, "name", str(last)))
        return "aux" if key == "quantiles" else "main"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizers(
    clip_norm: float = 1.0, lr_aux: float = 1e-3
) -> Tuple[Callable, Callable]:
    """(main_opt_fn, aux_opt_fn): each takes params -> GradientTransformation.

    The main transform emits a *descent direction* (scale(-1)); the traced
    learning rate is applied in the step so plateau scheduling never
    recompiles.  Off-partition leaves get zero updates (set_to_zero), never
    pass-through gradients.
    """

    def main(params):
        labels = quantile_labels(params)
        return optax.multi_transform(
            {
                "main": optax.chain(
                    optax.clip_by_global_norm(clip_norm),
                    optax.scale_by_adam(),
                    optax.scale(-1.0),
                ),
                "aux": optax.set_to_zero(),
            },
            labels,
        )

    def aux(params):
        labels = quantile_labels(params)
        return optax.multi_transform(
            {
                "aux": optax.chain(optax.scale_by_adam(), optax.scale(-lr_aux)),
                "main": optax.set_to_zero(),
            },
            labels,
        )

    return main, aux


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    aux_opt_state: Any
    step: jnp.ndarray


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.aux_opt_state, s.step), None),
    lambda _, c: TrainState(*c),
)


def create_train_state(module, params) -> Tuple[TrainState, Callable]:
    """Build state + train_step(state, batch, rng, lr, lmbda, metric,
    recompress) -> (state, logs).  ``lr`` and ``lmbda`` are traced scalars."""
    main_f, aux_f = make_optimizers()
    main_opt = main_f(params)
    aux_opt = aux_f(params)

    state = TrainState(
        params=params,
        opt_state=main_opt.init(params),
        aux_opt_state=aux_opt.init(params),
        step=jnp.zeros((), jnp.int32),
    )

    def train_step(
        state: TrainState,
        batch: jax.Array,
        rng: jax.Array,
        lr,
        lmbda,
        metric: str = "mse",
        recompress: bool = False,
    ):
        def loss_fn(p):
            result = module.apply(
                {"params": p}, batch, quant_mode="noise", rngs={"quant": rng}
            )
            out = rate_distortion_loss(result, batch, lmbda, metric)
            if recompress:
                # latent-stability regularizer (ref `train.py:384-392`)
                f1 = module.apply({"params": p}, result["x_hat"], method=module.g_a)
                loss_f1 = jnp.sqrt(jnp.sum((result["y"] - f1) ** 2))
                out["recompress_loss"] = loss_f1
                out["loss"] = out["loss"] + 0.01 * loss_f1
            return out["loss"], out

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        direction, opt_state = main_opt.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, d: p + lr * d, state.params, direction
        )

        def aux_loss_fn(p):
            return module.apply({"params": p}, method=module.aux_loss)

        aux_loss, aux_grads = jax.value_and_grad(aux_loss_fn)(params)
        aux_updates, aux_opt_state = aux_opt.update(
            aux_grads, state.aux_opt_state, params
        )
        params = optax.apply_updates(params, aux_updates)

        logs = dict(logs)
        logs["aux_loss"] = aux_loss
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            aux_opt_state=aux_opt_state,
            step=state.step + 1,
        )
        return new_state, logs

    return state, train_step


class ReduceLROnPlateau:
    """Host-side plateau scheduler matching torch's defaults used by the
    reference (`coder.py:125`): factor 0.5, patience 10, min mode."""

    def __init__(self, lr: float, factor: float = 0.5, patience: int = 10,
                 min_lr: float = 0.0):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        if self.best is None or metric < self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr
