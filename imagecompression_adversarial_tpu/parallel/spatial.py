"""Spatial tiling: the workload's "context parallelism" axis (SURVEY §5).

The reference never shards one image; its spatial scaling tools are
pad-to-64 tiling and block coding (`/root/reference/coder.py:32-34`,
`attack_TIC.py:91-103`).  Here a megapixel image is split into 64-aligned
tiles with overlap, the tile batch is processed data-parallel (optionally
sharded over the mesh's dp axis), and the reconstructions are blended back.
Overlap hides tile-boundary artifacts of the /16-downsampling codecs.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tile_image(
    x: np.ndarray, tile: int = 256, overlap: int = 64
) -> Tuple[np.ndarray, dict]:
    """Split (1, H, W, C) into overlapping (N, tile, tile, C) tiles.

    H, W must be multiples of 64 (pad-to-64 upstream); ``tile`` and
    ``overlap`` must be multiples of 64 so every tile stays codec-aligned.
    """
    assert tile % 64 == 0 and overlap % 64 == 0 and overlap < tile
    _, h, w, c = x.shape
    stride = tile - overlap
    ys = list(range(0, max(h - tile, 0) + 1, stride))
    xs = list(range(0, max(w - tile, 0) + 1, stride))
    if ys[-1] + tile < h:
        ys.append(h - tile)
    if xs[-1] + tile < w:
        xs.append(w - tile)
    tiles = np.stack([x[0, y0 : y0 + tile, x0 : x0 + tile] for y0 in ys for x0 in xs])
    meta = {"ys": ys, "xs": xs, "h": h, "w": w, "tile": tile}
    return tiles, meta


def untile_image(tiles: np.ndarray, meta: dict) -> np.ndarray:
    """Blend overlapping tiles back with linear feathering."""
    h, w, tile = meta["h"], meta["w"], meta["tile"]
    c = tiles.shape[-1]
    acc = np.zeros((h, w, c), np.float64)
    wsum = np.zeros((h, w, 1), np.float64)

    ramp = np.minimum(np.arange(1, tile + 1), np.arange(tile, 0, -1))
    ramp = np.minimum(ramp, tile // 4).astype(np.float64)  # plateau center
    wt = ramp[:, None] * ramp[None, :]
    wt = wt[..., None]

    k = 0
    for y0 in meta["ys"]:
        for x0 in meta["xs"]:
            acc[y0 : y0 + tile, x0 : x0 + tile] += tiles[k] * wt
            wsum[y0 : y0 + tile, x0 : x0 + tile] += wt
            k += 1
    return (acc / np.maximum(wsum, 1e-12)).astype(np.float32)[None]


def tiled_forward(
    apply_fn: Callable,
    x: np.ndarray,
    tile: int = 256,
    overlap: int = 64,
    mesh=None,
) -> np.ndarray:
    """Run a reconstruction function over spatial tiles (sharded over the
    mesh's dp axis when given); returns the blended reconstruction."""
    tiles, meta = tile_image(x, tile, overlap)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dp = mesh.shape["dp"]
        pad = (-len(tiles)) % n_dp
        if pad:
            tiles = np.concatenate([tiles, np.repeat(tiles[-1:], pad, axis=0)])
        sh = NamedSharding(mesh, P("dp"))
        tiles_d = jax.device_put(tiles, sh)
        with mesh:
            out = np.asarray(apply_fn(tiles_d))
        if pad:
            out = out[: len(out) - pad]
    else:
        out = np.asarray(apply_fn(jnp.asarray(tiles)))
    return untile_image(out, meta)
