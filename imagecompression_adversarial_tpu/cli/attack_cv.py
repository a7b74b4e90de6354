"""CLI: targeted / ROI attack.

Mirrors ``python attack_cv.py -s src.png -t target.png [--mask_loc x0 x1 y0
y1 -la_tar ... -la_bkg_in ... -la_bkg_out ...]``
(`/root/reference/attack_cv.py:346+`, README.md targeted examples), plus the
classifier-CE variant the reference scaffolds at `attack_cv.py:89-91,232-234`
(its checkpoint path is the literal ``"xxx"``): ``--cls_ckpt c.msgpack
--cls_label 3`` steers the reconstruction toward classifier label 3.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np

from ..attacks.targeted import TargetedAttackConfig, make_targeted_attack_fn
from ..config import Config, apply_precision, build_parser
from ..io.image import read_image, write_image
from ..runtime import load_model


def _load_classifier_logits_fn(ckpt: str):
    import flax.serialization

    from ..models.classifier import MLPClassifier, make_logits_fn

    module = MLPClassifier()
    template = module.init(
        jax.random.PRNGKey(0), np.zeros((1, 28, 28, 3), np.float32)
    )["params"]
    with open(ckpt, "rb") as f:
        params = flax.serialization.from_bytes(template, f.read())
    return make_logits_fn(module, params)


def run(cfg, cls_ckpt: str | None = None, cls_label: int | None = None) -> dict:
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
    logits_fn = _load_classifier_logits_fn(cls_ckpt) if cls_ckpt else None
    attack = make_targeted_attack_fn(
        module, att_cfg, classifier_logits_fn=logits_fn, target_label=cls_label
    )

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
    if logits_fn is not None:
        pred_s = int(np.argmax(np.asarray(logits_fn(res["output_s"]))))
        pred_a = int(np.argmax(np.asarray(logits_fn(res["output_"]))))
        print(f"classifier: clean-recon label {pred_s} -> adv-recon label "
              f"{pred_a} (target {cls_label})")
    out_dir = "./attack/targeted/"
    os.makedirs(out_dir, exist_ok=True)
    stem = out_dir + os.path.splitext(os.path.basename(cfg.source))[0]
    write_image(res["im_"], f"{stem}_fake_in.png", h, w)
    write_image(res["output_"], f"{stem}_fake_out.png", h, w)
    print(f"artifacts -> {stem}_fake_in.png / _fake_out.png")
    return {k: float(res[k]) for k in ("bpp_ori", "bpp", "vi")}


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--cls_ckpt", type=str, default=None,
                        help="classifier msgpack: CE-targeted attack")
    parser.add_argument("--cls_label", type=int, default=0,
                        help="target label for --cls_ckpt")
    ns = parser.parse_args(argv)
    cfg = Config(**{f.name: getattr(ns, f.name) for f in dataclasses.fields(Config)})
    run(cfg, cls_ckpt=ns.cls_ckpt, cls_label=ns.cls_label)


if __name__ == "__main__":
    main()
