"""Adversarial-noise transferability analysis.

Re-implements `/root/reference/transfer_noise.py`:
  * same-model cross-image transfer: attack each image of corpus A, add the
    resulting noise to every image of corpus B, record the VI matrix
    (`transfer_noise.py:110-151`)
  * cross-model transfer: attack with model i, evaluate VI under model j for
    every (i, j) pair (`test_transferability_multiple_models`,
    `transfer_noise.py:44-79`).

TPU notes: the transfer *evaluation* is a pure forward pass — it is jitted
once per model and vmappable over target images.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_transfer_eval_fn(module):
    """(params, x, noise) -> VI of pasting a foreign noise onto x."""

    def eval_fn(params, x, noise):
        im_ = jnp.clip(x + noise, 0.0, 1.0)
        out_s = jnp.clip(
            module.apply({"params": params}, x, quant_mode="dequantize")["x_hat"],
            0.0, 1.0,
        )
        out_adv = jnp.clip(
            module.apply({"params": params}, im_, quant_mode="dequantize")["x_hat"],
            0.0, 1.0,
        )
        mse_in = jnp.mean((im_ - x) ** 2)
        mse_out = jnp.mean((out_adv - out_s) ** 2)
        return 10.0 * jnp.log10(mse_out / mse_in)

    return jax.jit(eval_fn)


def cross_image_matrix(
    attack_fn, eval_fn, params, images: Sequence[np.ndarray]
) -> np.ndarray:
    """VI matrix[i, j]: noise attacked on image i, applied to image j."""
    n = len(images)
    vis = np.zeros((n, n), np.float32)
    for i, src in enumerate(images):
        res = attack_fn(params, jnp.asarray(src))
        noise = res["im_"] - jnp.asarray(src)
        for j, dst in enumerate(images):
            vis[i, j] = float(eval_fn(params, jnp.asarray(dst), noise))
    return vis


def cross_model_matrix(
    attacks: List[Tuple[Callable, dict]],
    evals: List[Tuple[Callable, dict]],
    images: Sequence[np.ndarray],
) -> np.ndarray:
    """transfer_matrix[i, j]: mean VI of examples attacked under model i,
    evaluated under model j.  ``attacks``/``evals`` are (fn, params) pairs."""
    n = len(attacks)
    matrix = np.zeros((n, n), np.float32)
    for i, (attack_fn, p_i) in enumerate(attacks):
        examples = []
        for im in images:
            res = attack_fn(p_i, jnp.asarray(im))
            examples.append((jnp.asarray(im), res["im_"] - jnp.asarray(im)))
        for j, (eval_fn, p_j) in enumerate(evals):
            vals = [float(eval_fn(p_j, x, nz)) for x, nz in examples]
            matrix[i, j] = float(np.mean(vals))
    return matrix


def plot_matrix(matrix: np.ndarray, path: str, vmin=-4, vmax=25) -> None:
    """Annotated heatmap (ref `transfer_noise.py:15-42,144-150`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.imshow(matrix, vmin=vmin, vmax=vmax)
    for i in range(matrix.shape[0]):
        for j in range(matrix.shape[1]):
            ax.text(j, i, int(matrix[i, j]), ha="center", va="center",
                    color="w", fontsize="xx-small")
    plt.tight_layout()
    plt.savefig(path, bbox_inches="tight")
    plt.close(fig)
