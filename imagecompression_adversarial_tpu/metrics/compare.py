"""Batch image-quality comparison between two directories / file lists.

The reference's standalone evaluator (`/root/reference/utils/
metrics_compare/metrics.py:8-101` and `compare.py:1-20`): pairwise PSNR and
MS-SSIM over matched file lists, averaged, plus an optional numpy MS-SSIM
(`msssim.py:119-178`) — here the JAX implementation in `metrics.msssim`
serves both roles (it is checked against the separable closed form in
tests).
"""

from __future__ import annotations

import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..io.image import list_images, read_image
from .core import psnr
from .msssim import ms_ssim


def compare_pair(a: np.ndarray, b: np.ndarray) -> Dict[str, float]:
    xa, xb = jnp.asarray(a), jnp.asarray(b)
    msim = float(ms_ssim(xa, xb))
    return {
        "psnr": float(psnr(xa, xb)),
        "msim": msim,
        "msim_dB": float(-10.0 * np.log10(1.0 - msim)) if msim < 1.0 else np.inf,
    }


def compare_globs(glob_a: str, glob_b: str) -> Dict[str, float]:
    """Pairwise metrics over two sorted globs (must match 1:1)."""
    files_a = list_images(glob_a)
    files_b = list_images(glob_b)
    if len(files_a) != len(files_b) or not files_a:
        raise ValueError(
            f"globs must match 1:1: {len(files_a)} vs {len(files_b)} files"
        )
    sums = {"psnr": 0.0, "msim": 0.0, "msim_dB": 0.0}
    for fa, fb in zip(files_a, files_b):
        im_a, _, _ = read_image(fa)
        im_b, _, _ = read_image(fb)
        m = compare_pair(im_a, im_b)
        print(f"{os.path.basename(fa)} vs {os.path.basename(fb)}: "
              + " ".join(f"{k} {v:.4f}" for k, v in m.items()))
        for k in sums:
            sums[k] += m[k]
    n = len(files_a)
    avg = {k: v / n for k, v in sums.items()}
    print("AVG: " + " ".join(f"{k} {v:.4f}" for k, v in avg.items()))
    return avg
