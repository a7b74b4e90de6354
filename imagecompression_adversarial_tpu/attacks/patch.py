"""Patch attack: run the RD attack, then extract the worst 64x64 patch.

Reference behaviour (`/root/reference/attack_patch.py:119-146`): unfold all
64x64 patches at stride 2, compute per-patch input/output MSE, zero a
10-patch border, take the argmax of the local VI map, save the
adv/ori input/output patch quadruple.

TPU-first: instead of materializing the O(H*W*64*64) unfold tensor, the
per-patch MSE maps are 64x64 box sums of the squared-difference image
(two separable reduce_windows) — same numbers, ~4000x less memory traffic.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _box_mean(sq_err: jax.Array, size: int, stride: int) -> jax.Array:
    """Mean over size x size windows at the given stride; input NHWC, output
    (newH, newW) averaged over channels too (matches unfold + mean(dim=1))."""
    summed = jax.lax.reduce_window(
        sq_err,
        0.0,
        jax.lax.add,
        (1, size, size, 1),
        (1, stride, stride, 1),
        "VALID",
    )
    return jnp.mean(summed, axis=(0, 3)) / (size * size)


def local_vi_map(
    im_adv, output_adv, im_s, output_s, patch: int = 64, stride: int = 2,
    border: int = 10,
) -> jax.Array:
    """Per-patch VI ratio mse_out/mse_in with a zeroed border (ref :136-140)."""
    mse_in = _box_mean((im_adv - im_s) ** 2, patch, stride)
    mse_out = _box_mean((output_adv - output_s) ** 2, patch, stride)
    vi = mse_out / (mse_in + 1e-20)
    mask = jnp.zeros_like(vi)
    mask = mask.at[border:-border, border:-border].set(1.0)
    return vi * mask


def extract_worst_patch(
    im_adv, output_adv, im_s, output_s, patch: int = 64, stride: int = 2
) -> Dict[str, jax.Array]:
    """Locate and slice the highest-local-VI patch from all four images."""
    vi = local_vi_map(im_adv, output_adv, im_s, output_s, patch, stride)
    flat_idx = jnp.argmax(vi)
    iy = flat_idx // vi.shape[1]
    ix = flat_idx % vi.shape[1]
    y0 = iy * stride
    x0 = ix * stride

    def crop(img):
        return jax.lax.dynamic_slice(
            img, (0, y0, x0, 0), (img.shape[0], patch, patch, img.shape[3])
        )

    return {
        "patch_adv": crop(im_adv),
        "patch_outadv": crop(output_adv),
        "patch_s": crop(im_s),
        "patch_outs": crop(output_s),
        "vi_value": vi[iy, ix],
        "location": jnp.stack([y0, x0]),
    }
