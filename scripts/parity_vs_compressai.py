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

`--self-test` (no other args) keeps the harness from bitrotting before real
weights arrive (VERDICT r2 missing #1): it fabricates a CompressAI-named
``.pth`` from raw-torch stand-in transforms (the recipe golden-tested in
`tests/test_convert.py`), runs the FULL load-convert-eval pipeline above on
a synthetic image, and additionally checks the converted g_a/g_s against
the torch stand-in forward at the 0.1% bar.  Exercised in CI by
`tests/test_parity_selftest.py`.
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

TOL = 1e-3  # 0.1 %


def self_test() -> None:
    """Run the whole harness against a fabricated CompressAI-style ckpt."""
    import tempfile

    import torch
    from PIL import Image

    import jax

    # hermetic: the self-test is a host-side numerics check, keep it off the
    # TPU tunnel (post-import override beats the axon site-hook, cf.
    # tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    # raw-torch bmshj2018 stand-in transforms with CompressAI names
    # (tests/test_convert.py recipe, golden-tested against our converter)
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
    from test_convert import _build_torch_transforms

    from imagecompression_adversarial_tpu.models import init_model, init_params

    module = init_model("factorized", 1)
    n, m = module.N, module.M
    g_a, g_s = _build_torch_transforms(n, m, seed=0)
    state = {}
    for prefix, seq in (("g_a", g_a), ("g_s", g_s)):
        for i, layer in enumerate(seq):
            for pname, val in layer.named_parameters():
                state[f"{prefix}.{i}.{pname}"] = val.detach()
    # entropy-bottleneck params: same layout both sides, rename-only —
    # borrow a fresh init so the checkpoint is complete (merge is strict)
    eb = init_params(module, jax.random.PRNGKey(0))["entropy_bottleneck"]
    for k, v in eb.items():
        tk = "quantiles" if k == "quantiles" else "_" + k.replace("_", "")
        state[f"entropy_bottleneck.{tk}"] = torch.from_numpy(np.asarray(v))

    with tempfile.TemporaryDirectory() as td:
        ckpt_path = os.path.join(td, "standin-factorized-1.pth")
        torch.save(state, ckpt_path)
        img_path = os.path.join(td, "selftest01.png")
        rng = np.random.RandomState(0)
        yy, xx = np.mgrid[0:128, 0:128]
        img = np.clip(
            np.stack([0.5 + 0.4 * np.sin(xx / 17.0),
                      0.5 + 0.4 * np.cos(yy / 23.0),
                      0.5 + 0.2 * np.sin((xx + yy) / 13.0)], -1)
            + rng.rand(128, 128, 3) * 0.05, 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(img_path)

        # the full harness path (compressai absent here -> JAX-only numbers)
        rc = run(argparse.Namespace(
            model="factorized", quality=1, metric="mse",
            checkpoint=ckpt_path, source=img_path,
        ))
        assert rc == 0, "harness run failed"

        # transform-level parity vs the torch stand-in at the 0.1% bar
        import jax.numpy as jnp

        from imagecompression_adversarial_tpu.io.convert import (
            load_torch_checkpoint,
        )
        from imagecompression_adversarial_tpu.runtime import _merge_strict

        template = init_params(module, jax.random.PRNGKey(1))
        params = _merge_strict(
            template, load_torch_checkpoint(ckpt_path, "factorized"), ckpt_path
        )
        x = np.asarray(img, np.float32)[None]
        with torch.no_grad():
            y_t = g_a(torch.from_numpy(x).permute(0, 3, 1, 2))
            x_rec_t = g_s(y_t).permute(0, 2, 3, 1).numpy()
        y_j = module.apply({"params": params}, jnp.asarray(x), method=module.g_a)
        x_rec_j = np.asarray(
            module.apply({"params": params}, y_j, method=module.g_s)
        )
        rel = np.max(np.abs(x_rec_j - x_rec_t)) / max(np.max(np.abs(x_rec_t)), 1e-9)
        assert rel <= TOL, f"transform parity {rel:.2e} > {TOL:.0e}"
        print(f"SELF-TEST PASS: transform rel err {rel:.2e} (bar {TOL:.0e}); "
              "full load-convert-eval pipeline ran")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--self-test", action="store_true",
                    help="fabricate a stand-in ckpt and run the whole harness")
    ap.add_argument("-m", dest="model",
                    choices=["factorized", "hyper", "context", "cheng2020"])
    ap.add_argument("-q", dest="quality", type=int)
    ap.add_argument("-metric", dest="metric", default="mse")
    ap.add_argument("-ckpt", dest="checkpoint")
    ap.add_argument("-s", dest="source")
    args = ap.parse_args()
    if args.self_test:
        self_test()
        return
    for req in ("model", "quality", "checkpoint", "source"):
        if getattr(args, req) in (None,):
            ap.error(f"missing required argument for {req} (or use --self-test)")
    raise SystemExit(run(args))


def run(args) -> int:

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
        return 0 if failed == 0 else 1
    return 0


if __name__ == "__main__":
    main()
