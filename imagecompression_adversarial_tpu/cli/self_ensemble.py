"""CLI: defense evaluation — attack images, evaluate through the defense.

Mirrors ``python self_ensemble.py --defend [--defend_m ensemble|resize|
bitdepth] [--adv]`` (`/root/reference/self_ensemble.py:328-441`): the RD
attack runs against each image and the final evaluation routes through the
chosen input-transform defense; ``--adv`` makes the attack adaptive
(optimizes through the defense in the loss).
"""

from __future__ import annotations

from ..attacks import RDAttackConfig, make_attack_fn
from ..config import apply_precision, parse_config
from ..defenses import make_defend_fn
from ..runtime import load_model
from ._corpus import run_corpus


def run(cfg) -> dict:
    apply_precision(cfg)
    module, params = load_model(cfg)

    att_cfg = RDAttackConfig(
        steps=cfg.steps,
        lr=cfg.lr_attack,
        noise_threshold=cfg.noise,
        epsilon=cfg.epsilon,
        clamp=cfg.clamp,
        defend_in_loop=cfg.method if (cfg.adv and cfg.defend) else None,
        ensemble_impl=cfg.ensemble_impl,
    )
    latent_transform = None
    if cfg.defend and cfg.method == "clip":
        # latent rank/dead-channel clamp (ref `self_ensemble.py:133-154`):
        # needs the profile + codec decomposition, not just the forward fn
        from functools import partial

        from ..analysis.feature_range import profile_path
        from ..defenses import clip_dead_channel, load_range_profile, make_latent_defend_fn

        prof_file = cfg.profile or profile_path(cfg.model, cfg.metric, cfg.quality)
        prof = load_range_profile(prof_file, require=("dead", "ranks_min"))
        transform = partial(
            clip_dead_channel, dead=prof["dead"], ranks_min=prof["ranks_min"]
        )
        defend_builder = lambda apply_fn: make_latent_defend_fn(
            module, params, transform
        )
        if att_cfg.defend_in_loop == "clip":
            # adaptive: the attack optimizes THROUGH the latent clamp
            latent_transform = transform
    elif cfg.defend:
        defend_builder = lambda apply_fn: make_defend_fn(apply_fn, cfg.method)
    else:
        defend_builder = None
    attack = make_attack_fn(
        module, att_cfg,
        defend_fn_builder=defend_builder,
        latent_transform=latent_transform,
    )

    def per_image(im, idx):
        return attack(params, im)

    return run_corpus(cfg.source, per_image)


def main(argv=None):
    cfg = parse_config(argv)
    if cfg.quality < 1:  # bitrate sweep (ref `attack_bitrates`,
        # self_ensemble.py:426-436)
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
