"""Input-transform defenses: geometric self-ensemble, resize, bit-depth.

Reference behaviour (`/root/reference/self_ensemble.py:34-171`):
  * 8 dihedral variants (identity + 3 flips, then the same four rotated 90
    degrees); the codec runs on all of them and the minimum-MSE variant's
    reconstruction (un-transformed) and likelihoods win
  * ``bitdepth``: 6-bit quantization of the input (dithered surrogate when a
    gradient path is needed)
  * ``resize``: bicubic down/up by 243/256 with antialiasing.

TPU design: the flip-group and the rotated group each form a single batch of
4 (shapes differ for non-square images), so the defense is two batched codec
forwards + an argmin gather instead of eight sequential runs — the vmapped
re-design SURVEY §2.7 item 2 calls for.  Everything is differentiable, so
an adaptive attacker can optimize straight through the defense
(ref `self_ensemble.py:254-274`).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.bounds import ste_round


def dihedral_forward(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """All 8 dihedral variants of an NHWC image.

    Returns (flip_group, rot_group): (4, H, W, C) and (4, W, H, C) — the
    identity/flips and the 90-degree-rotated flips.
    """
    assert x.shape[0] == 1, "dihedral ensemble operates on a single image"
    x0 = x[0]
    flips = jnp.stack(
        [
            x0,
            jnp.flip(x0, 0),
            jnp.flip(x0, 1),
            jnp.flip(jnp.flip(x0, 0), 1),
        ]
    )
    r = jnp.rot90(x0, 1, (0, 1))
    rots = jnp.stack(
        [
            r,
            jnp.flip(r, 0),
            jnp.flip(r, 1),
            jnp.flip(jnp.flip(r, 0), 1),
        ]
    )
    return flips, rots


def dihedral_inverse_group(x_hats_flip: jax.Array, x_hats_rot: jax.Array) -> jax.Array:
    """Undo the 8 transforms, returning (8, H, W, C) in original orientation."""
    inv_flips = jnp.stack(
        [
            x_hats_flip[0],
            jnp.flip(x_hats_flip[1], 0),
            jnp.flip(x_hats_flip[2], 1),
            jnp.flip(jnp.flip(x_hats_flip[3], 0), 1),
        ]
    )
    inv_rots = jnp.stack(
        [
            jnp.rot90(x_hats_rot[0], -1, (0, 1)),
            jnp.rot90(jnp.flip(x_hats_rot[1], 0), -1, (0, 1)),
            jnp.rot90(jnp.flip(x_hats_rot[2], 1), -1, (0, 1)),
            jnp.rot90(jnp.flip(jnp.flip(x_hats_rot[3], 0), 1), -1, (0, 1)),
        ]
    )
    return jnp.concatenate([inv_flips, inv_rots], axis=0)


def self_ensemble(
    apply_fn: Callable,
    x: jax.Array,
    quant_mode: str = "dequantize",
    impl: str = "batch",
) -> Dict[str, jax.Array]:
    """Geometric self-ensemble defense.

    Runs the codec on all 8 dihedral variants, un-transforms every
    reconstruction, and selects the min-MSE variant.  Returns
    {x_hat, bpp, best_idx, best_mse}; ``x_hat`` is clamped to [0,1]
    (ref returns the clamped un-transformed winner,
    `self_ensemble.py:131`).

    ``impl`` selects how the 8 variants are evaluated:
      * ``'batch'`` — two 4-variant batched forwards (the vmapped
        re-design, fastest when activations fit);
      * ``'scan'``  — a `lax.scan` over single-variant forwards, each
        step `jax.checkpoint`'d.  Differentiating through the defense then
        holds ONE variant's activations at a time instead of an 8-wide
        rematerialized batch backward — the footprint fix for the
        adaptive attack at full Kodak resolution (round-2 libtpu fault:
        RESULTS.md "Adaptive attack-through-defense").
    """
    flips, rots = dihedral_forward(x)
    num_pixels = x.shape[1] * x.shape[2]
    log2 = jnp.log(2.0)

    if impl == "scan":

        def body(carry, v):
            result = apply_fn(v[None], quant_mode=quant_mode)
            total = 0.0
            for lik in result["likelihoods"].values():
                total = total + jnp.sum(jnp.log(lik))
            return carry, (result["x_hat"][0], total / (-log2 * num_pixels))

        body = jax.checkpoint(body, prevent_cse=False)
        _, (xh_f, bpp_f) = jax.lax.scan(body, 0, flips)
        _, (xh_r, bpp_r) = jax.lax.scan(body, 0, rots)
        bpps = jnp.concatenate([bpp_f, bpp_r])
        recon = dihedral_inverse_group(xh_f, xh_r)  # (8, H, W, C)
    elif impl == "batch":
        res_f = apply_fn(flips, quant_mode=quant_mode)
        res_r = apply_fn(rots, quant_mode=quant_mode)

        def variant_bpps(result):
            total = 0.0
            for lik in result["likelihoods"].values():
                total = total + jnp.sum(
                    jnp.log(lik), axis=tuple(range(1, lik.ndim))
                )
            return total / (-log2 * num_pixels)  # (4,)

        bpps = jnp.concatenate([variant_bpps(res_f), variant_bpps(res_r)])
        recon = dihedral_inverse_group(res_f["x_hat"], res_r["x_hat"])
    else:
        raise ValueError(f"impl={impl!r} not in ['batch', 'scan']")

    mses = jnp.mean((recon - x) ** 2, axis=(1, 2, 3))
    best = jnp.argmin(mses)
    x_hat = jnp.clip(recon[best][None], 0.0, 1.0)
    return {
        "x_hat": x_hat,
        "bpp": bpps[best],
        "best_idx": best,
        "best_mse": mses[best],
    }


def bitdepth_reduction(
    x: jax.Array, bits: int = 6, inference: bool = True, key: Optional[jax.Array] = None
) -> jax.Array:
    """Reduce to ``bits`` bit-depth (ref `self_ensemble.py:58-68`).

    ``inference=False`` uses the dithered surrogate (uniform noise) so a
    gradient path exists for adaptive attacks; here the deterministic branch
    additionally keeps an identity gradient via ste_round.
    """
    scale = 2 ** bits - 1
    if inference:
        return ste_round(x * scale) / scale
    assert key is not None
    noise = jax.random.uniform(key, x.shape, x.dtype, -0.5, 0.5)
    return (x * scale + noise) / scale


def draw_resize_scale(seed: int) -> float:
    """Host-side draw of the randomized resize factor, uniform(0.5, 0.75)
    as in the reference's randomized variant (`self_ensemble.py:74-76`).

    The scale sets the resize SHAPES, which must be static under jit —
    so the draw happens eagerly on the host and the result is passed to
    :func:`random_resize` as a Python float (one compiled program per
    distinct scale)."""
    import numpy as np

    return float(np.random.default_rng(seed).uniform(0.5, 0.75))


def random_resize(
    x: jax.Array,
    scale: float = 243.0 / 256.0,
) -> Tuple[jax.Array, float]:
    """Bicubic down/up-sample (ref `self_ensemble.py:70-83`).  ``scale``
    must be a static Python float (it determines array shapes); for the
    randomized variant draw it host-side with :func:`draw_resize_scale`."""
    b, h, w, c = x.shape
    hd, wd = int(h * scale), int(w * scale)
    down = jax.image.resize(x, (b, hd, wd, c), method="cubic", antialias=True)
    up = jax.image.resize(down, (b, h, w, c), method="cubic", antialias=True)
    return up, scale


def make_defend_fn(
    apply_fn: Callable, method: str = "ensemble"
) -> Callable[[jax.Array], Tuple[jax.Array, Dict]]:
    """Build the eval-time defense hook used by `attacks.evaluate`:
    x -> (x_hat, likelihoods-or-bpp).  Dispatch mirrors ``defend``
    (ref `self_ensemble.py:156-171`)."""
    if method == "ensemble":

        def defend(x):
            out = self_ensemble(apply_fn, x)
            return out["x_hat"], {"__bpp__": out["bpp"]}

    elif method == "bitdepth":

        def defend(x):
            x_p = bitdepth_reduction(x, inference=True)
            result = apply_fn(x_p, quant_mode="dequantize")
            return result["x_hat"], result["likelihoods"]

    elif method == "resize":

        def defend(x):
            x_p, _ = random_resize(x)
            result = apply_fn(x_p, quant_mode="dequantize")
            return result["x_hat"], result["likelihoods"]

    else:
        raise ValueError(f"{method!r} not in ['ensemble', 'resize', 'bitdepth']")

    return defend
