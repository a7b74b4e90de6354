"""CLI: JPEG baseline RD numbers over a corpus.

Equivalent of the reference's cjpeg driver
(`/root/reference/test_commands/jpeg.sh:3-6`, quality-50 JPEG baseline):
encode with PIL's libjpeg, report real bpp and PSNR/MS-SSIM.
"""

from __future__ import annotations

import io as _io
import sys

import numpy as np
from PIL import Image

from ..metrics.compare import compare_pair


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    quality = 50
    if "-q" in argv:
        i = argv.index("-q")
        quality = int(argv[i + 1])
        del argv[i : i + 2]
    if "-device" in argv:
        i = argv.index("-device")
        if argv[i + 1] == "cpu":
            import jax

            jax.config.update("jax_platforms", "cpu")
        del argv[i : i + 2]
    if len(argv) != 1:
        raise SystemExit("usage: jpeg_baseline [-q 50] [-device cpu] <glob>")

    from ..io.image import list_images

    files = list_images(argv[0])
    if not files:
        raise SystemExit(f"no images match {argv[0]!r}")

    sums = {"bpp": 0.0, "psnr": 0.0, "msim": 0.0}
    for f in files:
        img = Image.open(f).convert("RGB")
        buf = _io.BytesIO()
        img.save(buf, format="JPEG", quality=quality)
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
