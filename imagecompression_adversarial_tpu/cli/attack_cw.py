"""CLI: Carlini&Wagner-style constrained attack (double bisection).

Mirrors ``python attack_cw.py`` / ``attack_cw_fast.py``
(`/root/reference/attack_cw.py:336-346`): ``-ssteps`` bisection rounds,
``-noise`` input budget, ``-la`` initial c.  ``--fast`` selects the
run-to-convergence inner loop of attack_cw_fast.
"""

from __future__ import annotations

from ..attacks.cw import CWAttackConfig, make_cw_attack_fn
from ..config import apply_precision, build_parser, Config
from ..runtime import load_model
from ._corpus import run_corpus
import dataclasses


def run(cfg, fast: bool = False) -> dict:
    apply_precision(cfg)
    module, params = load_model(cfg)

    att_cfg = CWAttackConfig(
        steps=cfg.steps,
        lr=cfg.lr_attack,
        noise_threshold=cfg.noise,
        epsilon=cfg.epsilon,
        lamb_attack=cfg.lamb_attack,
        search_steps=cfg.search_steps,
        clamp=cfg.clamp,
        fast=fast,
    )
    attack = make_cw_attack_fn(module, att_cfg)

    def per_image(im, idx):
        return attack(params, im)

    return run_corpus(cfg.source, per_image)


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--fast", action="store_true",
                        help="attack_cw_fast inner-loop variant")
    ns = parser.parse_args(argv)
    cfg = Config(**{f.name: getattr(ns, f.name) for f in dataclasses.fields(Config)})
    run(cfg, fast=ns.fast)


if __name__ == "__main__":
    main()
