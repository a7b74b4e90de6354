"""Host-side data pipeline: image folders -> shuffled random-crop batches.

Functional equivalent of the reference loader (`/root/reference/train.py:
98-152`): recursive image-folder datasets, random 256-crops, shuffling,
drop-last, parallel decode workers, seeded reproducibly.  Implemented as a
thread-pool decode + double-buffered prefetch generator (the torch
DataLoader worker-process pattern is host-side CPU work; threads suffice
because PIL decode releases the GIL).

When the data directory does not exist (this sandbox has no Vimeo/DIV2K),
`synthetic_batches` provides a deterministic structured-noise stream so the
training path stays exercisable end-to-end.
"""

from __future__ import annotations

import concurrent.futures as cf
import glob
import os
import queue
import threading
from typing import Iterator, List, Optional

import numpy as np

_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def list_image_files(root: str) -> List[str]:
    out = []
    for ext in _EXTS:
        out.extend(glob.glob(os.path.join(root, "**", f"*{ext}"), recursive=True))
    return sorted(out)


def _load_crop(path: str, crop: int, rng: np.random.Generator) -> Optional[np.ndarray]:
    from PIL import Image

    try:
        img = Image.open(path).convert("RGB")
    except Exception:
        return None
    w, h = img.size
    if w < crop or h < crop:
        return None
    x0 = int(rng.integers(0, w - crop + 1))
    y0 = int(rng.integers(0, h - crop + 1))
    img = img.crop((x0, y0, x0 + crop, y0 + crop))
    return np.asarray(img, np.float32) / 255.0


def image_folder_batches(
    root: str,
    batch_size: int,
    crop: int = 256,
    seed: int = 0,
    workers: int = 8,
    epochs: Optional[int] = None,
) -> Iterator[np.ndarray]:
    """Yield (B, crop, crop, 3) float32 batches forever (or for ``epochs``)."""
    files = list_image_files(root)
    if not files:
        raise FileNotFoundError(f"no images under {root}")
    rng = np.random.default_rng(seed)

    def one_epoch():
        order = rng.permutation(len(files))
        with cf.ThreadPoolExecutor(max_workers=workers) as pool:
            batch = []
            futures = [
                pool.submit(_load_crop, files[i], crop, np.random.default_rng(rng.integers(2**31)))
                for i in order
            ]
            for fut in futures:
                img = fut.result()
                if img is None:
                    continue
                batch.append(img)
                if len(batch) == batch_size:
                    yield np.stack(batch)
                    batch = []
        # drop_last

    e = 0
    while epochs is None or e < epochs:
        yield from one_epoch()
        e += 1


def synthetic_batches(
    batch_size: int, crop: int = 256, seed: int = 0
) -> Iterator[np.ndarray]:
    """Deterministic structured-noise batches (sandbox fallback)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:crop, 0:crop].astype(np.float32)
    while True:
        phases = rng.uniform(0, 6.28, (batch_size, 3, 2)).astype(np.float32)
        freq = rng.uniform(0.02, 0.3, (batch_size, 3, 2)).astype(np.float32)
        imgs = []
        for b in range(batch_size):
            chans = [
                0.5
                + 0.35 * np.sin(xx * freq[b, c, 0] + phases[b, c, 0])
                * np.cos(yy * freq[b, c, 1] + phases[b, c, 1])
                for c in range(3)
            ]
            img = np.stack(chans, -1) + rng.normal(0, 0.03, (crop, crop, 3))
            imgs.append(np.clip(img, 0, 1).astype(np.float32))
        yield np.stack(imgs)


def make_batches(
    root: Optional[str], batch_size: int, crop: int = 256, seed: int = 0
) -> Iterator[np.ndarray]:
    """Image-folder stream if the directory exists, else synthetic."""
    if root and os.path.isdir(root) and list_image_files(root):
        return image_folder_batches(root, batch_size, crop, seed)
    return synthetic_batches(batch_size, crop, seed)


def augment_dihedral(batches: Iterator[np.ndarray], seed: int = 0) -> Iterator[np.ndarray]:
    """Random dihedral augmentation (flips + rot90) per image.

    The zoo codecs the reference attacks are trained with flip augmentation;
    this is what makes the geometric self-ensemble defense effective
    (RESULTS.md) — without it the codec is not dihedral-invariant.
    """
    rng = np.random.default_rng(seed)
    for batch in batches:
        out = np.empty_like(batch)
        for i in range(batch.shape[0]):
            img = batch[i]
            k = rng.integers(0, 8)
            if k & 1:
                img = img[::-1, :, :]
            if k & 2:
                img = img[:, ::-1, :]
            if k & 4:
                img = np.rot90(img, 1, (0, 1))
            out[i] = img
        yield out


def prefetch(it: Iterator, depth: int = 2) -> Iterator:
    """Decouple host decode from device compute with a small queue."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _SENTINEL = object()

    def producer():
        try:
            for item in it:
                q.put(item)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        yield item
