"""MLP image classifier used as the target model of classifier-targeted
attacks.

Re-implements the reference's MNIST classifier (`/root/reference/
classifier.py:10-30`): a 5-layer MLP 3*28*28 -> 200 -> 100 -> 60 -> 30 -> 10
over flattened RGB 28x28 inputs, plus a small trainer
(`classifier-train.py:34-58`).
"""

from __future__ import annotations

from typing import Callable, Iterator, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax


class MLPClassifier(nn.Module):
    num_classes: int = 10
    widths: Tuple[int, ...] = (200, 100, 60, 30)
    input_hw: int = 28

    @nn.compact
    def __call__(self, x):
        # x: NHWC image in [0,1]; resized/cropped to input_hw by the caller
        x = x.reshape(x.shape[0], -1)
        for w in self.widths:
            x = nn.relu(nn.Dense(w)(x))
        return nn.Dense(self.num_classes)(x)


def make_logits_fn(module: MLPClassifier, params, hw: int = 28) -> Callable:
    """Adapt codec-resolution NHWC reconstructions to classifier logits:
    center-crop/resize to (hw, hw) then classify."""

    def logits_fn(x):
        b = x.shape[0]
        x28 = jax.image.resize(x, (b, hw, hw, x.shape[-1]), method="bilinear")
        return module.apply({"params": params}, x28)

    return logits_fn


def train_classifier(
    batches: Iterator[Tuple[jnp.ndarray, jnp.ndarray]],
    steps: int = 1000,
    lr: float = 1e-3,
    seed: int = 0,
    input_hw: int = 28,
):
    """Train on (images NHWC, labels) batches; returns (module, params)."""
    module = MLPClassifier(input_hw=input_hw)
    x0, _ = next(iter([next(batches)]))
    params = module.init(jax.random.PRNGKey(seed), x0)["params"]
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = module.apply({"params": p}, x)
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, y)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = step(params, opt_state, x0, _)
    for i, (x, y) in zip(range(steps - 1), batches):
        params, opt_state, loss = step(params, opt_state, x, y)
    return module, params, float(loss)
