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


def _materialize(entry):
    """A matrix leg is either a ready (fn, params) pair or a zero-arg thunk
    returning one (lazy: the model only lives for its own leg)."""
    if callable(entry) and not isinstance(entry, tuple):
        return entry()
    return entry


def _free_leg(lazy: bool) -> None:
    """Drop compiled executables + device buffers between lazy legs.

    Six-seven trained families' attack scans do not coexist in one chip's
    HBM (the round-5 full-matrix run died RESOURCE_EXHAUSTED holding every
    family's params + jitted 301-step scan at once); in lazy mode each leg
    re-materializes its model, so the jit caches are safe to clear.
    """
    if lazy:
        import gc

        gc.collect()
        jax.clear_caches()


def cross_model_matrix(
    attacks: List,
    evals: List,
    images: Sequence[np.ndarray],
    log: Callable[[str], None] = None,
) -> np.ndarray:
    """transfer_matrix[i, j]: mean VI of examples attacked under model i,
    evaluated under model j (ref `transfer_noise.py:44-79`).

    ``attacks``/``evals`` entries are (fn, params) pairs, or zero-arg thunks
    returning one.  Thunk (lazy) mode is the memory-light path: the matrix is
    computed in two host-staged phases — (1) per source model, attack every
    image and pull the noises to host numpy, then free the model; (2) per
    target model, evaluate every stored (image, noise) example — so at most
    ONE model's params + compiled programs are resident at a time.
    """
    n = len(attacks)
    lazy = any(callable(a) and not isinstance(a, tuple) for a in attacks + evals)
    say = log if log is not None else (lambda s: print(s, flush=True))
    matrix = np.zeros((n, n), np.float32)

    # Phase 1: attack under each source model; stage (image, noise) on host.
    staged = []  # [i] -> list of (np image, np noise)
    for i, entry in enumerate(attacks):
        attack_fn, p_i = _materialize(entry)
        exs = []
        for k, im in enumerate(images):
            res = attack_fn(p_i, jnp.asarray(im))
            noise = np.asarray(res["im_"]) - np.asarray(im, np.float32)
            exs.append((np.asarray(im, np.float32), noise))
            say(f"[attack {i + 1}/{n}] image {k + 1}/{len(images)} done")
        staged.append(exs)
        del attack_fn, p_i, res
        _free_leg(lazy)

    # Phase 2: evaluate every staged example under each target model.
    for j, entry in enumerate(evals):
        eval_fn, p_j = _materialize(entry)
        for i in range(n):
            vals = [
                float(eval_fn(p_j, jnp.asarray(x), jnp.asarray(nz)))
                for x, nz in staged[i]
            ]
            matrix[i, j] = float(np.mean(vals))
            say(f"[eval col {j + 1}/{n}] row {i + 1}/{n}: {matrix[i, j]:.2f}")
        del eval_fn, p_j
        _free_leg(lazy)
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
