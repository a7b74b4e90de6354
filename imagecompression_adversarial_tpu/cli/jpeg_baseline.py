"""CLI: JPEG baseline RD numbers over a corpus.

Equivalent of the reference's cjpeg driver
(`/root/reference/test_commands/jpeg.sh:3-6`, quality-50 JPEG baseline):
encode with PIL's libjpeg, report real bpp and PSNR/MS-SSIM.
"""

from __future__ import annotations

import argparse
import io as _io

import numpy as np
from PIL import Image

from ..metrics.compare import compare_pair


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="jpeg_baseline", description=__doc__.splitlines()[0]
    )
    p.add_argument("glob", help="image glob (e.g. '/data/kodak/*.png')")
    p.add_argument("-q", dest="quality", type=int, default=50,
                   help="JPEG quality (default 50, the reference's setting)")
    p.add_argument("-device", choices=("cpu", "tpu"), default=None,
                   help="force the metric computation backend")
    args = p.parse_args(argv)
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ..io.image import list_images

    files = list_images(args.glob)
    if not files:
        raise SystemExit(f"no images match {args.glob!r}")

    sums = {"bpp": 0.0, "psnr": 0.0, "msim": 0.0}
    for f in files:
        img = Image.open(f).convert("RGB")
        buf = _io.BytesIO()
        img.save(buf, format="JPEG", quality=args.quality)
        nbytes = buf.tell()
        dec = Image.open(buf)
        a = np.asarray(img, np.float32)[None] / 255.0
        b = np.asarray(dec, np.float32)[None] / 255.0
        m = compare_pair(a, b)
        bpp = nbytes * 8.0 / (img.width * img.height)
        print(f"{f}: bpp {bpp:.4f} psnr {m['psnr']:.2f} msim {m['msim']:.4f}")
        sums["bpp"] += bpp
        sums["psnr"] += m["psnr"]
        sums["msim"] += m["msim"]
    n = len(files)
    print("AVG: " + " ".join(f"{k} {v / n:.4f}" for k, v in sums.items()))


if __name__ == "__main__":
    main()
