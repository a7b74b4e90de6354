"""CLI: natural-adversarial-example search over a corpus.

Mirrors ``python search.py -m ... -q ... -s <glob>``
(`/root/reference/search.py:187-201`): score every image's latent against
the profiled activation ranges; print new-best findings, save them.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..analysis import make_detect_fn
from ..config import apply_precision, parse_config
from ..defenses import load_range_profile
from ..analysis.feature_range import profile_path
from ..io.image import list_images, read_image, write_image
from ..runtime import load_model


def run(cfg) -> list:
    apply_precision(cfg)
    module, params = load_model(cfg)

    path = profile_path(cfg.model, cfg.metric, cfg.quality, adv=cfg.adv)
    if not os.path.exists(path):
        raise SystemExit(
            f"no range profile at {path}; run cli.feature_range first"
        )
    profile = load_range_profile(path)

    g_a_fn = lambda x: module.apply({"params": params}, x, method=module.g_a)
    detect = make_detect_fn(g_a_fn, profile["channel_max"], profile["channel_min"])

    files = list_images(cfg.source)
    if not files:
        raise SystemExit(f"no images match source glob {cfg.source!r}")

    save_path = "./attack/search/"
    score_best = 0.0
    findings = []
    for f in files:
        im, h, w = read_image(f)
        score = float(detect(jnp.asarray(im)))
        findings.append((f, score))
        if score > score_best:
            print("FOUND YOU!", f, score)
            score_best = score
            os.makedirs(save_path, exist_ok=True)
            result = module.apply({"params": params}, jnp.asarray(im),
                                  quant_mode="dequantize")
            stem = os.path.splitext(os.path.basename(f))[0]
            write_image(np.asarray(im), save_path + stem + ".png", h, w)
            write_image(
                np.clip(np.asarray(result["x_hat"]), 0, 1),
                save_path + stem + f"_{score:.4f}.png", h, w,
            )
    return sorted(findings, key=lambda kv: -kv[1])


def main(argv=None):
    cfg = parse_config(argv)
    if cfg.quality < 1:
        from ..models import quality_range

        lo, hi = quality_range(cfg.model)
        for q in range(lo, hi + 1):
            cfg.quality = q
            run(cfg)
    else:
        run(cfg)


if __name__ == "__main__":
    main()
