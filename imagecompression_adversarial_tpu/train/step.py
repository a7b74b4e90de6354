"""Training state and jitted train step (main + auxiliary optimizers).

Reference mechanics being reproduced (`/root/reference/train.py:249-497`,
`coder.py:50-86`):
  * main Adam over every parameter except the entropy-bottleneck
    ``quantiles``; auxiliary Adam (lr 1e-3) over exactly the ``quantiles``
  * grad-norm clip 1.0 on the main update
  * rate-distortion loss with per-quality lambda; aux loss from the
    quantile CDF fit.

TPU-first: both optimizers live in one pjit-able ``train_step``; under a
data-parallel mesh the gradients are reduced with `psum` automatically by
XLA (batch sharded along 'dp', params replicated) — the collective layer the
reference never had (SURVEY §2.7).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .loss import rate_distortion_loss


def _quantiles_mask(params) -> Any:
    """Pytree mask: True exactly on leaves whose path ends in 'quantiles'."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_quantile_path(path):
        last = path[-1]
        key = getattr(last, "key", getattr(last, "name", str(last)))
        return key == "quantiles"

    paths = {jax.tree_util.keystr(p): is_quantile_path(p) for p, _ in flat}

    def mask_like(tree, pred):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: pred(jax.tree_util.keystr(p)), tree
        )

    return mask_like(params, lambda k: paths[k])


def make_optimizers(
    lr_main: float = 1e-4, lr_aux: float = 1e-3, clip_norm: float = 1.0
) -> Tuple[optax.GradientTransformation, optax.GradientTransformation, Callable]:
    """(main_opt, aux_opt, mask_fn).  Main excludes quantiles; aux is only
    quantiles.  Disjointness is by construction (ref asserts it at
    `coder.py:74-76`)."""

    def main(params):
        mask = _quantiles_mask(params)
        inv = jax.tree_util.tree_map(lambda b: not b, mask)
        return optax.masked(
            optax.chain(optax.clip_by_global_norm(clip_norm), optax.adam(lr_main)),
            inv,
        )

    def aux(params):
        mask = _quantiles_mask(params)
        return optax.masked(optax.adam(lr_aux), mask)

    return main, aux, _quantiles_mask


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    aux_opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.aux_opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux_data, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.aux_opt_state, s.step), None),
    lambda _, c: TrainState(*c),
)


def create_train_state(
    module, params, lr_main: float = 1e-4, lr_aux: float = 1e-3
) -> Tuple[TrainState, Callable]:
    """Build state + the jitted train_step(state, batch, rng) -> (state, logs)."""
    main_f, aux_f, _ = make_optimizers(lr_main, lr_aux)
    main_opt = main_f(params)
    aux_opt = aux_f(params)

    state = TrainState(
        params=params,
        opt_state=main_opt.init(params),
        aux_opt_state=aux_opt.init(params),
        step=jnp.zeros((), jnp.int32),
    )

    def train_step(state, batch, rng, lmbda: float, metric: str = "mse"):
        def loss_fn(p):
            result = module.apply(
                {"params": p}, batch, quant_mode="noise", rngs={"quant": rng}
            )
            out = rate_distortion_loss(result, batch, lmbda, metric)
            return out["loss"], out

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = main_opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

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
