"""CLI: real bitstream encode/decode through the native rANS coder.

The one-shot encode-decode entry (ref ``coder.code``,
`/root/reference/coder.py:153-164`, and the real-coder inference path the
reference only exercises in its TIC adapter, `attack_TIC.py:86-136`):

    python -m ...cli.codec -m hyper -q 1 -s in.png -t out.png

prints the REAL bpp (bytes on the wire) next to the entropy estimate.

Batch bitstream drivers (the reference's NIC encode/decode scripts,
`/root/reference/utils/metrics_compare/encode.py:10-15` and
`decode.py:24-31`, which pack H/W into the container trailer):

    python -m ...cli.codec -m hyper -q 1 --encode -s 'kodak/*.png' -t out/
    python -m ...cli.codec -m hyper -q 1 --decode -s 'out/*.bin'   -t rec/

``.bin`` is self-contained up to the model: latent shape + image H,W +
length-prefixed rANS strings.
"""

from __future__ import annotations

import os
import struct

import jax.numpy as jnp
import numpy as np

from ..config import apply_precision, parse_config
from ..entropy.codec import RealCodec
from ..io.image import list_images, read_image, write_image
from ..metrics import bpp_from_likelihoods, psnr
from ..runtime import load_model


def write_container(path: str, out: dict, h: int, w: int) -> None:
    """shape + original H,W + len-prefixed strings (self-contained decode)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<HHHH", *out["shape"], h, w))
        for s in out["strings"]:
            f.write(struct.pack("<I", len(s)))
            f.write(s)


def read_container(path: str):
    with open(path, "rb") as f:
        raw = f.read()
    sh, sw, h, w = struct.unpack("<HHHH", raw[:8])
    strings, off = [], 8
    while off < len(raw):
        (n,) = struct.unpack("<I", raw[off : off + 4])
        strings.append(raw[off + 4 : off + 4 + n])
        off += 4 + n
    return strings, (sh, sw), h, w


def encode_glob(cfg, codec: RealCodec) -> None:
    os.makedirs(cfg.target or ".", exist_ok=True)
    for path in list_images(cfg.source):
        im, h, w = read_image(path)
        out = codec.compress(im)
        name = os.path.splitext(os.path.basename(path))[0] + ".bin"
        dst = os.path.join(cfg.target or ".", name)
        write_container(dst, out, h, w)
        bpp = codec.real_bpp(out, h * w)
        print(f"{path} -> {dst}: real_bpp {bpp:.4f}")


def decode_glob(cfg, codec: RealCodec) -> None:
    import glob as _glob

    os.makedirs(cfg.target or ".", exist_ok=True)
    for path in sorted(_glob.glob(cfg.source)):
        strings, shape, h, w = read_container(path)
        x_hat = codec.decompress(strings, shape)
        name = os.path.splitext(os.path.basename(path))[0] + "_rec.png"
        dst = os.path.join(cfg.target or ".", name)
        write_image(x_hat, dst, h, w)
        print(f"{path} -> {dst}: {h}x{w}")


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
        write_container(cfg.target + ".bin", out, h, w)

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
    if cfg.encode or cfg.decode:
        apply_precision(cfg)
        module, params = load_model(cfg)
        codec = RealCodec(module, params)
        if cfg.encode:
            encode_glob(cfg, codec)
        if cfg.decode:
            decode_glob(cfg, codec)
        return
    run(cfg)


if __name__ == "__main__":
    main()
