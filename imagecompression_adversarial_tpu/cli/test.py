"""CLI: rate-distortion evaluation over an image corpus.

Mirrors ``python test.py -m ... -q ... -s ...``
(`/root/reference/test.py:29-75`): per-image and averaged bpp / PSNR /
MS-SSIM, optional defense preprocessing (``--defend``), quality sweep when
``-q`` < 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import apply_precision, parse_config
from ..defenses import make_defend_fn
from ..metrics import bpp_from_likelihoods, ms_ssim, psnr
from ..runtime import load_model
from ._corpus import run_corpus


def run(cfg) -> dict:
    apply_precision(cfg)
    module, params = load_model(cfg)

    def eval_fn(params, x):
        apply_fn = lambda im, quant_mode: module.apply(
            {"params": params}, im, quant_mode=quant_mode
        )
        if cfg.defend:
            x_hat, lik = make_defend_fn(apply_fn, cfg.method)(x)
        else:
            result = apply_fn(x, quant_mode="dequantize")
            x_hat, lik = result["x_hat"], result["likelihoods"]
        x_hat = jnp.clip(x_hat, 0.0, 1.0)
        num_pixels = x.shape[1] * x.shape[2]
        if isinstance(lik, dict) and "__bpp__" in lik:
            bpp = lik["__bpp__"]
        else:
            bpp = bpp_from_likelihoods(lik, num_pixels)
        msim = ms_ssim(x_hat, x)
        return {
            "bpp": bpp,
            "psnr": psnr(x_hat, x),
            "msim": msim,
            "msim_dB": -10.0 * jnp.log10(1.0 - msim),
        }

    jitted = jax.jit(eval_fn)

    def per_image(im, idx):
        return jitted(params, im)

    return run_corpus(cfg.source, per_image, fields=("bpp", "psnr", "msim", "msim_dB"))


def main(argv=None):
    cfg = parse_config(argv)
    if cfg.quality < 1:  # sweep (ref test.py:66-75)
        from ..models import quality_range

        lo, hi = quality_range(cfg.model)
        for q in range(lo, hi + 1):
            cfg.quality = q
            print(f"== quality {q} ==")
            run(cfg)
    else:
        run(cfg)


if __name__ == "__main__":
    main()
