"""CLI: train the MLP classifier used by classifier-targeted attacks.

Mirrors ``python classifier-train.py`` (`/root/reference/classifier-train.py:
34-75`).  ``-s`` points at an image-folder dataset laid out as
``root/<label>/*.png``; without one, a synthetic labeled stream keeps the
pipeline runnable.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

import flax.serialization

from ..config import apply_precision, parse_config
from ..models.classifier import train_classifier


def _image_folder_labeled(root: str, batch_size: int, hw: int = 28, seed=0):
    from PIL import Image

    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    files = []
    for li, c in enumerate(classes):
        for f in os.listdir(os.path.join(root, c)):
            files.append((os.path.join(root, c, f), li))
    rng = np.random.default_rng(seed)
    while True:
        idx = rng.choice(len(files), batch_size)
        xs, ys = [], []
        for i in idx:
            path, label = files[i]
            img = Image.open(path).convert("RGB").resize((hw, hw))
            xs.append(np.asarray(img, np.float32) / 255.0)
            ys.append(label)
        yield jnp.asarray(np.stack(xs)), jnp.asarray(np.asarray(ys, np.int32))


def _synthetic_labeled(batch_size: int, hw: int = 28, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        ys = rng.integers(0, 10, batch_size)
        xs = np.zeros((batch_size, hw, hw, 3), np.float32)
        for i, y in enumerate(ys):  # label-dependent stripe pattern
            xs[i, :, :, :] = 0.1
            xs[i, y * 2 : y * 2 + 3, :, :] = 0.9
        xs += rng.normal(0, 0.05, xs.shape).astype(np.float32)
        yield jnp.asarray(np.clip(xs, 0, 1)), jnp.asarray(ys.astype(np.int32))


def run(cfg) -> float:
    apply_precision(cfg)
    root = cfg.source if os.path.isdir(cfg.source) else None
    batches = (
        _image_folder_labeled(root, cfg.batch_size)
        if root
        else _synthetic_labeled(cfg.batch_size)
    )
    module, params, loss = train_classifier(batches, steps=cfg.steps)
    out = cfg.checkpoint or "./ckpts/classifier.msgpack"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    print(f"final loss {loss:.4f}; saved classifier -> {out}")
    return loss


def main(argv=None):
    cfg = parse_config(argv)
    run(cfg)


if __name__ == "__main__":
    main()
