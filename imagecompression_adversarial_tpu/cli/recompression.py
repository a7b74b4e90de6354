"""CLI: recompression stability test.

Mirrors ``python recompression.py -s ... -m ... -q ... -steps N [--defend]``
(`/root/reference/recompression.py:65-69`): re-encode each image N times
(default 50), report final bpp / PSNR / MS-SSIM vs the pristine original.
"""

from __future__ import annotations

from ..analysis import make_recompression_fn
from ..config import apply_precision, parse_config
from ..runtime import load_model
from ._corpus import run_corpus


def run(cfg) -> dict:
    apply_precision(cfg)
    module, params = load_model(cfg)
    repeats = cfg.recompress or cfg.steps
    if cfg.defend:
        print("Self Ensemble Applied!")
    fn = make_recompression_fn(
        module, repeats=repeats, defend=("ensemble" if cfg.defend else None)
    )

    def per_image(im, idx):
        res = fn(params, im)
        return {k: v for k, v in res.items() if k != "bpp_trajectory"}

    return run_corpus(cfg.source, per_image, fields=("bpp", "psnr", "msim", "msim_dB"))


def main(argv=None):
    cfg = parse_config(argv)
    run(cfg)


if __name__ == "__main__":
    main()
