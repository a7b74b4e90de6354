"""Recompression stability: re-encode the reconstruction N times.

Re-implements `/root/reference/recompression.py:19-63`: run the codec on its
own (quantized-to-uint8) output ``repeat_times`` times (default 50), report
the final bpp / PSNR / MS-SSIM against the pristine original; optional
self-ensemble defense inside the loop.

TPU-first: the reference round-trips every iteration through PNG files on
disk; here the uint8 write/read is a round() on device, so the whole chain
is one `lax.scan` — 50 recompressions in a single compiled program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..metrics import bpp_from_likelihoods, ms_ssim, psnr


def make_recompression_fn(module, repeats: int = 50, defend: Optional[str] = None):
    """(params, x) -> {bpp, psnr, msim, msim_dB} after ``repeats`` cycles."""

    def recompress(params, x):
        apply_fn = lambda im, quant_mode: module.apply(
            {"params": params}, im, quant_mode=quant_mode
        )
        num_pixels = x.shape[1] * x.shape[2]

        def one_cycle(im, _):
            if defend == "ensemble":
                from ..defenses.self_ensemble import self_ensemble

                out = self_ensemble(apply_fn, im)
                x_hat, bpp = out["x_hat"], out["bpp"]
            else:
                result = apply_fn(im, quant_mode="dequantize")
                x_hat = jnp.clip(result["x_hat"], 0.0, 1.0)
                bpp = bpp_from_likelihoods(result["likelihoods"], num_pixels)
            # uint8 round-trip (the reference writes a PNG each cycle)
            x_hat = jnp.round(x_hat * 255.0) / 255.0
            return x_hat, bpp

        final, bpps = jax.lax.scan(one_cycle, x, None, length=repeats)
        msim = ms_ssim(final, x)
        return {
            "bpp": bpps[-1],
            "psnr": psnr(final, x),
            "msim": msim,
            "msim_dB": -10.0 * jnp.log10(1.0 - msim),
            "bpp_trajectory": bpps,
        }

    return jax.jit(recompress)
