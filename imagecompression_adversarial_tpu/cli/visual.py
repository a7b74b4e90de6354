"""CLI: encode/decode visualization dumps.

Mirrors ``python visual.py -s in.png -t out.png`` and the latent-dump side
of `/root/reference/visual.py:56-101` and `visual_random_noise.py:61-109`:
write the reconstruction, dump ``y_hat.npy``, optionally add sigma-0.0316
Gaussian noise first.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import apply_precision, parse_config
from ..io.image import read_image, write_image
from ..metrics import psnr
from ..runtime import load_model


def run(cfg, noised: bool = False) -> dict:
    apply_precision(cfg)
    module, params = load_model(cfg)

    im, h, w = read_image(cfg.source)
    x = jnp.asarray(im)
    if noised:
        x = jnp.clip(
            x + 0.0316 * jax.random.normal(jax.random.PRNGKey(0), x.shape), 0, 1
        )

    result = module.apply({"params": params}, x, quant_mode="dequantize")
    x_hat = jnp.clip(result["x_hat"], 0.0, 1.0)

    out = cfg.target or "rec.png"
    write_image(np.asarray(x_hat), out, h, w)
    np.save(os.path.splitext(out)[0] + "_y_hat.npy", np.asarray(result["y_hat"]))
    if noised:
        write_image(np.asarray(x), os.path.splitext(out)[0] + "_in.png", h, w)
    p = float(psnr(x_hat, jnp.asarray(im)))
    print(f"{cfg.source} -> {out} psnr {p:.2f}")
    return {"psnr": p}


def main(argv=None):
    cfg = parse_config(argv)
    run(cfg, noised=(cfg.degrade == "noise"))


if __name__ == "__main__":
    main()
