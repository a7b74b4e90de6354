"""CLI: Gaussian-noise / blur robustness evaluation.

Mirrors ``python random_noise.py -s ... [-degrade deblur -t <sharp-glob>]``
(`/root/reference/random_noise.py:113-164`): per-image noise-amplification
VI, bpp and PSNR; with ``-q 0`` sweeps noise levels {1e-5..1e-2} x quality.
"""

from __future__ import annotations

import jax

from ..analysis import make_deblur_eval_fn, make_noise_eval_fn
from ..config import apply_precision, parse_config
from ..io.image import list_images, read_image
from ..runtime import load_model
from ._corpus import run_corpus


def run(cfg) -> dict:
    apply_precision(cfg)

    if cfg.degrade == "blurgen":
        # generate blur images calibrated to the -noise MSE budget
        # (ref `generate_blurimages`, random_noise.py:50-66)
        import os

        from ..analysis import calibrated_blur
        from ..io.image import write_image

        out_dir = "./attack/blur/"
        os.makedirs(out_dir, exist_ok=True)
        for f in list_images(cfg.source):
            im, h, w = read_image(f)
            blurred, sigma = calibrated_blur(im, target_mse=cfg.noise)
            name = os.path.basename(f)
            write_image(blurred, out_dir + name, h, w)
            print(f"{name}: sigma {sigma:.3f} -> {out_dir + name}")
        return {}

    module, params = load_model(cfg)

    if cfg.degrade == "deblur":
        sharp_files = list_images(cfg.target or "")
        blur_files = list_images(cfg.source)
        if len(sharp_files) != len(blur_files):
            raise SystemExit("deblur mode needs matching -s (blur) and -t (sharp) globs")
        fn = make_deblur_eval_fn(module)

        sums = {"dpsnr": 0.0, "bpp": 0.0, "psnr_out": 0.0}
        for bf, sf in zip(blur_files, sharp_files):
            im_b = read_image(bf)[0]
            im_s = read_image(sf)[0]
            res = {k: float(v) for k, v in fn(params, im_b, im_s).items()}
            print(f"{bf}: " + " ".join(f"{k} {v:.4f}" for k, v in res.items()))
            for k in sums:
                sums[k] += res[k]
        n = len(blur_files)
        avg = {k: v / n for k, v in sums.items()}
        print("AVG: " + " ".join(f"{k} {v:.4f}" for k, v in avg.items()))
        return avg

    fn = make_noise_eval_fn(module)

    def per_image(im, idx):
        key = jax.random.PRNGKey(idx)
        return fn(params, im, key, cfg.noise)

    return run_corpus(cfg.source, per_image, fields=("vi_noise", "bpp", "bpp_ori", "psnr"))


def main(argv=None):
    cfg = parse_config(argv)
    if cfg.quality < 1:  # noise x quality sweep (ref :153-164)
        from ..models import quality_range

        lo, hi = quality_range(cfg.model)
        for noise in (1e-5, 1e-4, 1e-3, 1e-2):
            cfg.noise = noise
            for q in range(lo, hi + 1):
                cfg.quality = q
                print(f"== noise {noise} quality {q} ==")
                run(cfg)
    else:
        run(cfg)


if __name__ == "__main__":
    main()
