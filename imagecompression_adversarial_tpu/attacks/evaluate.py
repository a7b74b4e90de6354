"""Canonical post-attack evaluation.

Re-implements the shared ``eval`` the reference routes every attack through
(`/root/reference/self_ensemble.py:173-252`): run the codec on the
adversarial input in round-quantization mode, compute the entropy-estimated
bpp, input/output MSE and MS-SSIM, and the headline VI metrics.  Defense
preprocessing hooks in through `defenses.defend` (same dispatch as ref
`self_ensemble.py:156-171`).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp

from ..metrics import bpp_from_likelihoods, ms_ssim, vi, vi_msim


def evaluate(
    apply_fn: Callable[..., Dict[str, Any]],
    im_adv,
    im_s,
    output_s,
    clamp: bool = True,
    defend_fn: Optional[Callable] = None,
) -> Dict[str, Any]:
    """Evaluate an adversarial example against the clean reference output.

    Args:
      apply_fn: ``lambda x, quant_mode: result_dict`` closure over params.
      im_adv: adversarial input (NHWC).
      im_s: clean input.
      output_s: clean reconstruction (already clamped).
      clamp: clamp inputs/outputs to [0, 1] (ref ``--no-clamp`` inverts).
      defend_fn: optional ``lambda x: (x_processed, result_dict)`` defense
        preprocessing; when given, metrics/bpp use the defended forward.

    Returns dict with im_, output_, bpp, mse_in/out, msim_in/out, vi, vi_msim.
    """
    im_ = jnp.clip(im_adv, 0.0, 1.0) if clamp else im_adv

    if defend_fn is not None:
        x_hat, likelihoods = defend_fn(im_)
    else:
        result = apply_fn(im_, quant_mode="dequantize")
        x_hat = result["x_hat"]
        likelihoods = result["likelihoods"]

    output_ = jnp.clip(x_hat, 0.0, 1.0) if clamp else x_hat

    num_pixels = im_adv.shape[1] * im_adv.shape[2]
    if isinstance(likelihoods, dict) and "__bpp__" in likelihoods:
        bpp = likelihoods["__bpp__"]  # defense already reduced to a rate
    else:
        bpp = bpp_from_likelihoods(likelihoods, num_pixels)

    mse_in = jnp.mean((im_ - im_s) ** 2)
    mse_out = jnp.mean((output_ - output_s) ** 2)
    msim_in = ms_ssim(im_, im_s)
    msim_out = ms_ssim(output_, output_s)

    return {
        "im_": im_,
        "output_": output_,
        "bpp": bpp,
        "mse_in": mse_in,
        "mse_out": mse_out,
        "msim_in": msim_in,
        "msim_out": msim_out,
        "vi": vi(mse_in, mse_out),
        "vi_msim": vi_msim(msim_in, msim_out),
    }
