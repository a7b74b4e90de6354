"""Shared corpus-loop runner for attack/eval CLIs: iterate a source glob,
run a per-image jitted function, print per-image and AVG report lines
(the reference's output contract, `/root/reference/attack_rd.py:670-688`)."""

from __future__ import annotations

import os
import time
from typing import Callable, Dict

import jax
import numpy as np

from ..io.image import list_images, read_image


def run_corpus(
    source: str,
    per_image: Callable[[np.ndarray, int], Dict],
    fields=("bpp_ori", "bpp", "vi", "vi_msim"),
) -> Dict[str, float]:
    """Run ``per_image(image, index) -> result dict`` over a glob; report."""
    files = list_images(source)
    if not files:
        raise SystemExit(f"no images match source glob {source!r}")

    sums = {k: 0.0 for k in fields}
    sums["t"] = 0.0
    n = 0
    for path in files:
        im, h, w = read_image(path)
        t0 = time.time()
        res = per_image(np.asarray(im, np.float32), n)
        res = jax.tree_util.tree_map(np.asarray, res)
        dt = time.time() - t0

        parts = [f"{os.path.basename(path)}:"]
        for k in fields:
            if k in res:
                parts.append(f"{k} {float(res[k]):.4f}")
                sums[k] += float(res[k])
        parts.append(f"t {dt:.2f}s")
        print(" ".join(parts))
        sums["t"] += dt
        n += 1

    avg = {k: v / n for k, v in sums.items()}
    print("AVG: " + " ".join(f"{k} {v:.4f}" for k, v in avg.items()))
    return avg
