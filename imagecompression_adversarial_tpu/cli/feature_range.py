"""CLI: profile per-channel latent activation ranges over a corpus.

Mirrors ``python feature_range.py -m ... -q ... -s <glob>``
(`/root/reference/feature_range.py:24-72`); saves the npz profile consumed
by the latent-clamp defenses and `cli.search`.
"""

from __future__ import annotations

import numpy as np

from ..analysis import profile_latents, profile_path, save_profile
from ..config import apply_precision, parse_config
from ..io.image import list_images, read_image
from ..runtime import load_model


def run(cfg) -> str:
    apply_precision(cfg)
    module, params = load_model(cfg)
    print("[Activation Range Evaluator]:", cfg.source)

    g_a_fn = lambda x: module.apply({"params": params}, x, method=module.g_a)

    files = list_images(cfg.source)
    if not files:
        raise SystemExit(f"no images match source glob {cfg.source!r}")

    def images():
        for f in files[:10000]:
            yield read_image(f)[0]

    profile = profile_latents(g_a_fn, images())
    path = profile_path(cfg.model, cfg.metric, cfg.quality, adv=cfg.adv)
    save_profile(profile, path)
    print(f"channel_max[:5]={np.round(profile['channel_max'][:5], 3)}")
    print(f"channel_min[:5]={np.round(profile['channel_min'][:5], 3)}")
    print(f"saved profile -> {path}")
    return path


def main(argv=None):
    cfg = parse_config(argv)
    run(cfg)


if __name__ == "__main__":
    main()
