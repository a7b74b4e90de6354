"""Spatial tiling tests: exact coverage, blend identity, sharded forward."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecompression_adversarial_tpu.parallel.mesh import make_mesh
from imagecompression_adversarial_tpu.parallel.spatial import (
    tile_image,
    tiled_forward,
    untile_image,
)


def test_tile_untile_identity():
    rng = np.random.RandomState(0)
    x = rng.rand(1, 512, 768, 3).astype(np.float32)
    tiles, meta = tile_image(x, tile=256, overlap=64)
    rec = untile_image(tiles, meta)
    np.testing.assert_allclose(rec, x, rtol=1e-5, atol=1e-6)


def test_tile_counts_cover_image():
    x = np.zeros((1, 448, 640, 3), np.float32)
    tiles, meta = tile_image(x, tile=256, overlap=64)
    # strides of 192 + final-edge tiles must cover both dims
    assert meta["ys"][-1] + 256 == 448
    assert meta["xs"][-1] + 256 == 640


def test_tiled_forward_identity_fn_sharded():
    mesh = make_mesh(8)
    x = np.random.RandomState(1).rand(1, 512, 512, 3).astype(np.float32)
    out = tiled_forward(lambda t: t, x, tile=256, overlap=64, mesh=mesh)
    np.testing.assert_allclose(out, x, rtol=1e-5, atol=1e-6)


def test_tiled_forward_through_codec():
    from imagecompression_adversarial_tpu.models import init_model, init_params

    module = init_model("factorized", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    fwd = jax.jit(
        lambda t: jnp.clip(
            module.apply({"params": params}, t, quant_mode="dequantize")["x_hat"],
            0.0, 1.0,
        )
    )
    x = np.random.RandomState(2).rand(1, 320, 320, 3).astype(np.float32)
    out = tiled_forward(fwd, x, tile=256, overlap=64)
    assert out.shape == x.shape
    assert np.isfinite(out).all()
