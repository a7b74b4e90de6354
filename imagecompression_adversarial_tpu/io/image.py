"""Image IO: PNG <-> float arrays with pad-to-multiple semantics.

Behavioural equivalent of the reference's `read_image` / `write_image`
(`/root/reference/coder.py:21-48`): images are zero-padded up to a multiple
of 64 (the codecs downsample 16x; 64 keeps every stage aligned) and cropped
back on write.  Arrays are NHWC float32 in [0, 1].
"""

from __future__ import annotations

import glob as _glob
from typing import List, Tuple

import numpy as np
from PIL import Image


def pad_to_multiple(img: np.ndarray, multiple: int = 64) -> np.ndarray:
    """Zero-pad HWC image up to the next multiple along H and W."""
    h, w, c = img.shape
    hp = int(multiple * np.ceil(h / multiple))
    wp = int(multiple * np.ceil(w / multiple))
    out = np.zeros((hp, wp, c), dtype=img.dtype)
    out[:h, :w] = img
    return out


def read_image(path: str, padding: int = 64) -> Tuple[np.ndarray, int, int]:
    """Load a PNG as (1, H_pad, W_pad, 3) float32 in [0,1]; returns (im, H, W)."""
    img = np.asarray(Image.open(path), dtype=np.float32) / 255.0
    if img.ndim == 2:
        img = np.tile(img[..., None], (1, 1, 3))
    if img.shape[-1] == 4:  # drop alpha
        img = img[..., :3]
    h, w, _ = img.shape
    padded = pad_to_multiple(img, padding)
    return padded[None, ...], h, w


def write_image(x, path: str, H: int | None = None, W: int | None = None) -> None:
    """Save (1, H, W, 3) float array as 8-bit PNG, cropping to (H, W)."""
    arr = np.asarray(x)
    if arr.ndim == 4:
        arr = arr[0]
    if H is None and W is None:
        H, W = arr.shape[0], arr.shape[1]
    out = np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)
    Image.fromarray(out[:H, :W, :]).save(path)


def list_images(pattern: str) -> List[str]:
    """Expand a source glob (reference `-s` flag)."""
    return sorted(_glob.glob(pattern))
