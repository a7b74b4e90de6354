"""Generate the 24-image synthetic Kodak-geometry corpus at /tmp/kodak_synth.

The sandbox has no real datasets (zero egress), so on-chip demos run on a
deterministic synthetic corpus with the real Kodak set's geometry: 24
images, 18 landscape 768x512 + 6 portrait 512x768 (the portrait indices
mirror real Kodak's 04/09/10/17/18/19).  kodim01/02 keep the ORIGINAL
2-image recipe every round-1..5 log was produced with (the verify skill's
snippet, seed 0); kodim03..24 cycle six content classes — smooth
gradients+blobs, sinusoid interference, checker/stripe structure,
filtered-noise texture, radial waves, piecewise-constant regions — so the
corpus spans the frequency/structure range the reference's Kodak table
averages over (`/root/reference/attack_rd.py:654-688`).

Usage: python scripts/make_kodak24.py [outdir]
"""

import sys

import numpy as np
from PIL import Image


def _legacy_two(outdir):
    # EXACT round-1 recipe (verify skill) — do not change: all committed
    # kodim01/02 numbers in RESULTS.md were measured on these bytes.
    rng = np.random.RandomState(0)
    for i in range(2):
        h, w = 512, 768
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.clip(
            np.stack([0.5 + 0.4 * np.sin(xx / 40.0 + i),
                      0.5 + 0.4 * np.cos(yy / 60.0),
                      0.5 + 0.2 * np.sin((xx + yy) / 30.0)], -1)
            + rng.rand(h, w, 3) * 0.05, 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            f"{outdir}/kodim{i + 1:02d}.png")


def main(outdir="/tmp/kodak_synth"):
    import os

    os.makedirs(outdir, exist_ok=True)
    rng = np.random.RandomState(42)
    portrait = {4, 9, 10, 17, 18, 19}
    for i in range(1, 25):
        h, w = (768, 512) if i in portrait else (512, 768)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        k = i % 6
        if k == 0:
            img = np.stack([xx / w, yy / h,
                            0.5 + 0.5 * np.sin(xx * yy / (w * h) * 6)], -1)
            for _ in range(8):
                cy, cx, r = rng.rand() * h, rng.rand() * w, 30 + rng.rand() * 80
                img[..., rng.randint(3)] += 0.4 * np.exp(
                    -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r))
        elif k == 1:
            img = np.stack([0.5 + 0.4 * np.sin(xx / (20 + 3 * i) + i),
                            0.5 + 0.4 * np.cos(yy / (30 + 2 * i)),
                            0.5 + 0.2 * np.sin((xx + yy) / (15 + i))], -1)
        elif k == 2:
            img = np.stack([((xx // (8 + i)) % 2) * 0.7 + 0.15,
                            ((yy // (12 + i)) % 2) * 0.6 + 0.2,
                            (((xx + yy) // (10 + i)) % 2) * 0.5 + 0.25], -1)
        elif k == 3:
            from scipy.ndimage import gaussian_filter

            base = rng.rand(h, w, 3)
            img = np.stack([gaussian_filter(base[..., c], 1.5 + 0.5 * c)
                            for c in range(3)], -1)
            img = (img - img.min()) / (img.max() - img.min())
        elif k == 4:
            cy, cx = h / 2 + rng.randn() * 60, w / 2 + rng.randn() * 60
            r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
            img = np.stack([0.5 + 0.4 * np.sin(r / (8 + i % 7)),
                            0.5 + 0.4 * np.cos(r / (14 + i % 5)),
                            0.5 + 0.3 * np.sin(r / (20 + i % 9) + xx / w * 3)], -1)
        else:
            img = np.zeros((h, w, 3)) + rng.rand(3) * 0.3 + 0.2
            for _ in range(12):
                y0, x0 = rng.randint(h), rng.randint(w)
                hh, ww = rng.randint(40, h // 2), rng.randint(40, w // 2)
                img[y0:y0 + hh, x0:x0 + ww] = rng.rand(3)
        img = np.clip(img + rng.rand(h, w, 3) * 0.03, 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            f"{outdir}/kodim{i:02d}.png")
    _legacy_two(outdir)  # overwrite 01/02 with the round-1 bytes
    print(f"wrote 24 images -> {outdir}")


if __name__ == "__main__":
    main(*sys.argv[1:])
