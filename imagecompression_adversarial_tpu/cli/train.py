"""CLI: RD training / adversarial finetuning / recompression training.

Mirrors ``python train.py [--adv] [-re N] -m ... -q ... -metric ...``
(`/root/reference/train.py:499-502`).  ``-s`` points at the training image
folder (the reference hard-codes a Vimeo path, `train.py:291-293`); absent
data falls back to a synthetic stream so the pipeline stays runnable.
"""

from __future__ import annotations

import dataclasses
import os

from ..config import Config, apply_precision, build_parser


def main(argv=None):
    parser = build_parser()
    parser.add_argument("-data", dest="data_root", type=str, default=None,
                        help="training image folder (default: -s dir or synthetic)")
    parser.add_argument("-max_steps", dest="max_steps", type=int, default=None,
                        help="stop after N steps (smoke runs)")
    parser.add_argument("-augment", dest="augment", action="store_true",
                        help="random dihedral augmentation (flips + rot90)")
    ns = parser.parse_args(argv)
    cfg = Config(**{f.name: getattr(ns, f.name) for f in dataclasses.fields(Config)})
    apply_precision(cfg)

    data_root = ns.data_root
    if data_root is None and cfg.source and os.path.isdir(os.path.dirname(cfg.source)):
        data_root = os.path.dirname(cfg.source)

    from ..train.trainer import train

    summary = train(cfg, data_root=data_root, max_steps=ns.max_steps,
                    augment=ns.augment)
    print("TRAIN DONE:", summary)


if __name__ == "__main__":
    main()
