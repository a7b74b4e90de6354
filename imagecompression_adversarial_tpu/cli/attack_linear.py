"""CLI: latent-linearity / activation safe-zone analysis.

Mirrors ``python attack_linear.py`` (`/root/reference/attack_linear.py` — a
clone of attack_rd used for activation analysis): run the RD attack, then
compare the natural vs adversarial latent channel activations against the
profiled corpus ranges (`show_max_bar` with fill-between,
`attack_linear.py:163-204`).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..attacks import RDAttackConfig, make_attack_fn
from ..analysis.feature_range import profile_path
from ..config import apply_precision, parse_config
from ..io.image import list_images, read_image
from ..runtime import load_model
from ..utils.introspect import channel_maxima, show_max_bar


def run(cfg) -> dict:
    apply_precision(cfg)
    module, params = load_model(cfg)

    attack = make_attack_fn(
        module,
        RDAttackConfig(steps=cfg.steps, lr=cfg.lr_attack,
                       noise_threshold=cfg.noise, epsilon=cfg.epsilon,
                       clamp=cfg.clamp),
    )
    g_a = lambda x: module.apply({"params": params}, x, method=module.g_a)

    files = list_images(cfg.source)
    if not files:
        raise SystemExit(f"no images match source glob {cfg.source!r}")

    prof_file = profile_path(cfg.model, cfg.metric, cfg.quality, adv=cfg.adv)
    profile = None
    if os.path.exists(prof_file):
        data = np.load(prof_file)
        profile = {"channel_max": data["channel_max"],
                   "channel_min": data["channel_min"]}

    out = {}
    for path in files[:4]:
        im, _, _ = read_image(path)
        res = attack(params, jnp.asarray(im))
        y_nat = g_a(jnp.asarray(im))
        y_adv = g_a(res["im_"])
        stem = os.path.splitext(os.path.basename(path))[0]
        save = f"{cfg.model}_{cfg.quality}_{stem}_activations.png"
        show_max_bar([y_nat, y_adv], ["natural example", "adversarial example"],
                     save_path=save, sort=True)
        exceeded = None
        if profile is not None:
            adv_max = channel_maxima(y_adv)
            exceeded = int(np.sum(adv_max > profile["channel_max"]))
            print(f"{stem}: vi {float(res['vi']):.4f} channels over profiled "
                  f"range: {exceeded}/{adv_max.shape[0]} plot -> {save}")
        else:
            print(f"{stem}: vi {float(res['vi']):.4f} plot -> {save} "
                  f"(no range profile at {prof_file}; run cli.feature_range)")
        out[stem] = {"vi": float(res["vi"]), "exceeded": exceeded}
    return out


def main(argv=None):
    cfg = parse_config(argv)
    run(cfg)


if __name__ == "__main__":
    main()
