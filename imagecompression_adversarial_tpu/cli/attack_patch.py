"""CLI: patch attack — RD attack + worst-64x64-patch extraction.

Mirrors ``python attack_patch.py`` (`/root/reference/attack_patch.py:
351-365`): runs the RD attack, finds the patch with the highest local VI,
saves the adversarial/original input/output patch quadruple.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..attacks import RDAttackConfig, make_attack_fn
from ..attacks.patch import extract_worst_patch
from ..config import apply_precision, parse_config
from ..io.image import list_images, read_image, write_image
from ..runtime import load_model


def run(cfg) -> list:
    apply_precision(cfg)
    module, params = load_model(cfg)

    att_cfg = RDAttackConfig(
        steps=cfg.steps, lr=cfg.lr_attack, noise_threshold=cfg.noise,
        epsilon=cfg.epsilon, clamp=cfg.clamp,
    )
    attack = make_attack_fn(module, att_cfg)
    extract = jax.jit(extract_worst_patch)

    files = list_images(cfg.source)
    if not files:
        raise SystemExit(f"no images match source glob {cfg.source!r}")

    out_dir = "./attack/patches/"
    os.makedirs(out_dir, exist_ok=True)
    results = []
    for path in files:
        im, h, w = read_image(path)
        res = attack(params, im)
        patches = extract(res["im_"], res["output_"], im, res["output_s"])
        y0, x0 = np.asarray(patches["location"])
        v = float(patches["vi_value"])
        stem = out_dir + os.path.splitext(os.path.basename(path))[0]
        for key, suffix in (
            ("patch_adv", "advin"), ("patch_outadv", "advout"),
            ("patch_s", "oriin"), ("patch_outs", "oriout"),
        ):
            write_image(np.asarray(patches[key]), f"{stem}_{suffix}.png")
        print(f"{os.path.basename(path)}: patch@({int(y0)},{int(x0)}) "
              f"local_vi_ratio {v:.2f} image_vi {float(res['vi']):.4f}")
        results.append((path, v))
    return results


def main(argv=None):
    cfg = parse_config(argv)
    run(cfg)


if __name__ == "__main__":
    main()
