"""CLI: targeted / ROI attack.

Mirrors ``python attack_cv.py -s src.png -t target.png [--mask_loc x0 x1 y0
y1 -la_tar ... -la_bkg_in ... -la_bkg_out ...]``
(`/root/reference/attack_cv.py:346+`, README.md targeted examples).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..attacks.targeted import TargetedAttackConfig, make_targeted_attack_fn
from ..config import apply_precision, parse_config
from ..io.image import read_image, write_image
from ..runtime import load_model


def run(cfg) -> dict:
    apply_precision(cfg)
    module, params = load_model(cfg)

    att_cfg = TargetedAttackConfig(
        steps=cfg.steps,
        lr=cfg.lr_attack,
        noise_threshold=cfg.noise,
        att_metric=cfg.att_metric if cfg.att_metric in ("L1", "L2", "masked") else "L2",
        clamp=cfg.clamp,
        lamb_tar=cfg.lamb_tar,
        lamb_bkg_in=cfg.lamb_bkg_in,
        lamb_bkg_out=cfg.lamb_bkg_out,
        mask_loc=tuple(cfg.mask_loc) if cfg.mask_loc else None,
    )
    attack = make_targeted_attack_fn(module, att_cfg)

    im_s, h, w = read_image(cfg.source)
    target = None
    if cfg.target and os.path.exists(cfg.target):
        t_img, th, tw = read_image(cfg.target)
        if t_img.shape != im_s.shape:
            raise SystemExit(
                f"target shape {t_img.shape} != source shape {im_s.shape}"
            )
        target = t_img

    res = attack(params, im_s, target)
    res = jax.tree_util.tree_map(np.asarray, res)
    print(
        f"bpp_ori {float(res['bpp_ori']):.4f} bpp_adv {float(res['bpp']):.4f} "
        f"vi {float(res['vi']):.4f} loss_i {float(res['loss_i_final']):.6f} "
        f"loss_o {float(res['loss_o_final']):.6f}"
    )
    out_dir = "./attack/targeted/"
    os.makedirs(out_dir, exist_ok=True)
    stem = out_dir + os.path.splitext(os.path.basename(cfg.source))[0]
    write_image(res["im_"], f"{stem}_fake_in.png", h, w)
    write_image(res["output_"], f"{stem}_fake_out.png", h, w)
    print(f"artifacts -> {stem}_fake_in.png / _fake_out.png")
    return {k: float(res[k]) for k in ("bpp_ori", "bpp", "vi")}


def main(argv=None):
    cfg = parse_config(argv)
    run(cfg)


if __name__ == "__main__":
    main()
