"""CLI: I-FGSM / PGD / MI-FGSM sign-gradient attacks.

Mirrors ``python attack_ifgsm.py -m ... -q ... -s ...``
(`/root/reference/attack_ifgsm.py:441+`; the reference entry enables
momentum, i.e. MI-FGSM, by default at `:574`).  ``-random N`` gives
multi-start PGD best-of-VI.
"""

from __future__ import annotations

import jax

from ..attacks.ifgsm import IFGSMConfig, best_of_multistart, make_ifgsm_fn
from ..config import apply_precision, parse_config
from ..runtime import load_model
from ._corpus import run_corpus


def run(cfg) -> dict:
    apply_precision(cfg)
    module, params = load_model(cfg)

    att_cfg = IFGSMConfig(
        steps=cfg.steps,
        epsilon=cfg.epsilon,
        random_start=cfg.random > 1,
        momentum=True,  # reference entry point uses MI-FGSM
        clamp=cfg.clamp,
    )
    attack = make_ifgsm_fn(module, att_cfg)

    def per_image(im, idx):
        if cfg.random > 1:
            keys = jax.random.split(jax.random.PRNGKey(idx), cfg.random)
            return best_of_multistart(attack, params, im, keys)
        key = jax.random.PRNGKey(idx) if att_cfg.random_start else None
        return attack(params, im, key)

    return run_corpus(cfg.source, per_image)


def main(argv=None):
    cfg = parse_config(argv)
    run(cfg)


if __name__ == "__main__":
    main()
