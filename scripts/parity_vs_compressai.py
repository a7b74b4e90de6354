"""North-star parity check against real CompressAI weights (BASELINE.md:
Kodak reconstruction PSNR/bpp within 0.1% of the PyTorch reference).

The sandbox has no compressai package and no zoo egress, so this script is
the one-command harness for the moment real weights ARE available:

  python scripts/parity_vs_compressai.py \
      -m hyper -q 1 -metric mse -ckpt /path/bmshj2018-hyperprior-1-xxxx.pth \
      -s '/path/kodak/kodim*.png'

For every image it runs the converted JAX codec (dequantize mode, matmul
precision 'highest') and reports PSNR/bpp; if `compressai` is importable it
also runs the original torch model on the same tensors and reports the
relative deltas with a PASS/FAIL verdict at the 0.1% bar (ref coder eval
path: `/root/reference/coder.py:96-116`, `test.py:29-60`).
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

TOL = 1e-3  # 0.1 %


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", dest="model", required=True,
                    choices=["factorized", "hyper", "context", "cheng2020"])
    ap.add_argument("-q", dest="quality", type=int, required=True)
    ap.add_argument("-metric", dest="metric", default="mse")
    ap.add_argument("-ckpt", dest="checkpoint", required=True)
    ap.add_argument("-s", dest="source", required=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")

    from imagecompression_adversarial_tpu.io.convert import load_torch_checkpoint
    from imagecompression_adversarial_tpu.io.image import list_images, read_image
    from imagecompression_adversarial_tpu.models import init_model, init_params
    from imagecompression_adversarial_tpu.runtime import _merge_strict
    from imagecompression_adversarial_tpu.metrics import bpp_from_likelihoods, psnr

    module = init_model(args.model, args.quality)
    template = init_params(module, jax.random.PRNGKey(0))
    converted = load_torch_checkpoint(args.checkpoint, args.model)
    params = _merge_strict(template, converted, args.checkpoint)
    fwd = jax.jit(
        lambda x: module.apply({"params": params}, x, quant_mode="dequantize")
    )

    torch_model = None
    try:
        import torch
        from compressai.zoo import models as zoo_models

        zoo_name = {
            "factorized": "bmshj2018-factorized",
            "hyper": "bmshj2018-hyperprior",
            "context": "mbt2018",
            "cheng2020": "cheng2020-anchor",
        }[args.model]
        torch_model = zoo_models[zoo_name](
            quality=args.quality, metric=args.metric, pretrained=False
        )
        ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
        state = ckpt.get("state_dict", ckpt)
        torch_model.load_state_dict(state)
        torch_model.update(force=True)
        torch_model.eval()
        print("[parity] compressai available: running dual-stack comparison")
    except ImportError:
        print("[parity] compressai NOT importable: reporting JAX numbers only")

    files = list_images(args.source)
    if not files:
        raise SystemExit(f"no images match {args.source!r}")

    worst_psnr_rel, worst_bpp_rel, failed = 0.0, 0.0, 0
    for path in files:
        im, h, w = read_image(path)
        x = jnp.asarray(np.asarray(im, np.float32))
        res = fwd(x)
        num_pixels = x.shape[1] * x.shape[2]
        bpp_j = float(bpp_from_likelihoods(res["likelihoods"], num_pixels))
        x_hat = np.clip(np.asarray(res["x_hat"]), 0, 1)[:, :h, :w]
        psnr_j = float(psnr(jnp.asarray(x_hat), jnp.asarray(np.asarray(im)[:, :h, :w])))

        line = f"{os.path.basename(path)}: jax psnr {psnr_j:.4f} bpp {bpp_j:.4f}"
        if torch_model is not None:
            import torch

            xt = torch.from_numpy(np.asarray(im, np.float32)).permute(0, 3, 1, 2)
            with torch.no_grad():
                out = torch_model(xt)
            bpp_t = float(sum(
                torch.log(l).sum() / (-math.log(2) * num_pixels)
                for l in out["likelihoods"].values()
            ))
            xh_t = out["x_hat"].clamp(0, 1).permute(0, 2, 3, 1).numpy()[:, :h, :w]
            mse_t = float(np.mean((xh_t - np.asarray(im)[:, :h, :w]) ** 2))
            psnr_t = 10.0 * math.log10(1.0 / mse_t)
            rel_p = abs(psnr_j - psnr_t) / psnr_t
            rel_b = abs(bpp_j - bpp_t) / bpp_t
            worst_psnr_rel = max(worst_psnr_rel, rel_p)
            worst_bpp_rel = max(worst_bpp_rel, rel_b)
            ok = rel_p <= TOL and rel_b <= TOL
            failed += 0 if ok else 1
            line += (f" | torch psnr {psnr_t:.4f} bpp {bpp_t:.4f} | "
                     f"dpsnr {rel_p:.2e} dbpp {rel_b:.2e} "
                     f"{'PASS' if ok else 'FAIL'}")
        print(line)

    if torch_model is not None:
        verdict = "PASS" if failed == 0 else f"FAIL ({failed}/{len(files)} images)"
        print(f"PARITY {verdict}: worst rel dPSNR {worst_psnr_rel:.2e}, "
              f"worst rel dbpp {worst_bpp_rel:.2e} (bar {TOL:.0e})")
        raise SystemExit(0 if failed == 0 else 1)


if __name__ == "__main__":
    main()
