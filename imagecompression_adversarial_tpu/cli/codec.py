"""CLI: real bitstream encode/decode through the native rANS coder.

The one-shot encode-decode entry (ref ``coder.code``,
`/root/reference/coder.py:153-164`, and the real-coder inference path the
reference only exercises in its TIC adapter, `attack_TIC.py:86-136`):

    python -m ...cli.codec -m hyper -q 1 -s in.png -t out.png

prints the REAL bpp (bytes on the wire) next to the entropy estimate.
"""

from __future__ import annotations

import struct

import jax.numpy as jnp
import numpy as np

from ..config import apply_precision, parse_config
from ..entropy.codec import RealCodec
from ..io.image import read_image, write_image
from ..metrics import bpp_from_likelihoods, psnr
from ..runtime import load_model


def run(cfg) -> dict:
    apply_precision(cfg)
    module, params = load_model(cfg)
    codec = RealCodec(module, params)

    im, h, w = read_image(cfg.source)
    num_pixels = h * w

    out = codec.compress(im)
    real_bpp = codec.real_bpp(out, num_pixels)
    # entropy floor of the actual coded symbols under the actual CDF rows —
    # available for EVERY family, including the sequential AR paths
    ideal_bpp = out["ideal_bits"] / num_pixels
    x_hat = codec.decompress(out["strings"], out["shape"])

    result = module.apply({"params": params}, jnp.asarray(im),
                          quant_mode="dequantize")
    est_bpp = float(bpp_from_likelihoods(result["likelihoods"], num_pixels))
    p = float(psnr(jnp.asarray(x_hat), jnp.asarray(im)))

    if cfg.target:
        write_image(x_hat, cfg.target, h, w)
        # container: shapes + strings
        with open(cfg.target + ".bin", "wb") as f:
            f.write(struct.pack("<HH", *out["shape"]))
            for s in out["strings"]:
                f.write(struct.pack("<I", len(s)))
                f.write(s)

    # three-way split: real - ideal = rANS coder overhead;
    # est - ideal = estimator/table calibration error
    print(
        f"{cfg.source}: real_bpp {real_bpp:.4f} est_bpp {est_bpp:.4f} "
        f"ideal_bpp {ideal_bpp:.4f} psnr {p:.2f}"
    )
    return {
        "real_bpp": real_bpp,
        "est_bpp": est_bpp,
        "ideal_bpp": ideal_bpp,
        "psnr": p,
    }


def main(argv=None):
    cfg = parse_config(argv)
    run(cfg)


if __name__ == "__main__":
    main()
