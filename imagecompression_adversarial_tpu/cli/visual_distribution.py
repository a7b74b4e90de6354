"""CLI: latent-distribution analysis plots.

Mirrors ``python visual_distribution.py`` (`/root/reference/
visual_distribution.py:85-220`): histogram of the quantized latent of one
channel against its predicted Gaussian pmf; channels ranked by rate
inflation between a natural image and its adversarial copy (produced by
`cli.attack_rd --debug` artifacts or any second image via ``-t``).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..analysis import latent_histogram, predicted_distribution, rate_inflation_ranking
from ..config import apply_precision, parse_config
from ..io.image import read_image
from ..runtime import load_model


def run(cfg) -> dict:
    apply_precision(cfg)
    module, params = load_model(cfg)

    im, _, _ = read_image(cfg.source)
    res = module.apply({"params": params}, jnp.asarray(im), quant_mode="dequantize")
    out = {"channels_by_rate": None}

    if cfg.target and os.path.exists(cfg.target):
        im2, _, _ = read_image(cfg.target)
        res2 = module.apply(
            {"params": params}, jnp.asarray(im2), quant_mode="dequantize"
        )
        ranking = rate_inflation_ranking(res["likelihoods"]["y"], res2["likelihoods"]["y"])
        top = ranking["ranking"][:10]
        print("top rate-inflated channels:", top.tolist())
        print("inflation (bits):", np.round(ranking["inflation"][top], 1).tolist())
        out["channels_by_rate"] = top.tolist()
        channel = int(top[0])
    else:
        rates = np.asarray(jnp.sum(-jnp.log2(res["likelihoods"]["y"]), axis=(0, 1, 2)))
        channel = int(np.argmax(rates))
        print(f"highest-rate channel: {channel}")

    hist, edges = latent_histogram(res["y_hat"], channel)
    if "scales_hat" in res:
        scales = res["scales_hat"][..., channel]
        means = res.get("means_hat")
        means = means[..., channel] if means is not None else jnp.zeros_like(scales)
        pmf = predicted_distribution(jnp.mean(means)[None], jnp.mean(scales)[None])
        pmf = np.asarray(pmf)[:, 0]
    else:
        pmf = None

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    centers = (edges[:-1] + edges[1:]) / 2
    plt.figure(figsize=(6, 4))
    plt.bar(centers, hist, width=1.0, alpha=0.6, label="empirical y_hat")
    if pmf is not None:
        grid = np.arange(-30, 31)
        plt.plot(grid, pmf, "r-", label="predicted Gaussian pmf")
    plt.legend()
    plt.title(f"channel {channel}")
    save = f"{cfg.model}_{cfg.quality}_distribution.png"
    plt.savefig(save, bbox_inches="tight")
    plt.close()
    print(f"plot -> {save}")
    out["plot"] = save
    return out


def main(argv=None):
    cfg = parse_config(argv)
    run(cfg)


if __name__ == "__main__":
    main()
