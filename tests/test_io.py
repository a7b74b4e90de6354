"""Image IO and config-surface tests."""

import os
import tempfile

import numpy as np
from PIL import Image

from imagecompression_adversarial_tpu.config import build_parser, parse_config
from imagecompression_adversarial_tpu.io.image import (
    list_images,
    pad_to_multiple,
    read_image,
    write_image,
)


def test_pad_to_multiple():
    img = np.ones((100, 130, 3), np.float32)
    p = pad_to_multiple(img, 64)
    assert p.shape == (128, 192, 3)
    np.testing.assert_allclose(p[:100, :130], 1.0)
    np.testing.assert_allclose(p[100:, :], 0.0)


def test_read_write_roundtrip():
    with tempfile.TemporaryDirectory() as d:
        rng = np.random.RandomState(0)
        arr = (rng.rand(50, 70, 3) * 255).astype(np.uint8)
        path = os.path.join(d, "img.png")
        Image.fromarray(arr).save(path)

        im, h, w = read_image(path)
        assert (h, w) == (50, 70)
        assert im.shape == (1, 64, 128, 3)
        np.testing.assert_allclose(im[0, :50, :70] * 255, arr, atol=0.5)

        out_path = os.path.join(d, "out.png")
        write_image(im, out_path, h, w)
        back = np.asarray(Image.open(out_path))
        np.testing.assert_array_equal(back, arr)

        assert list_images(os.path.join(d, "*.png")) == sorted([path, out_path])


def test_read_grayscale_promotes_to_rgb():
    with tempfile.TemporaryDirectory() as d:
        arr = (np.random.RandomState(1).rand(40, 40) * 255).astype(np.uint8)
        path = os.path.join(d, "gray.png")
        Image.fromarray(arr, mode="L").save(path)
        im, h, w = read_image(path)
        assert im.shape == (1, 64, 64, 3)
        np.testing.assert_allclose(im[0, :, :, 0], im[0, :, :, 1])


def test_config_reference_flag_surface():
    cfg = parse_config(
        [
            "-m", "hyper", "-metric", "mse", "-q", "2", "-s", "a/*.png",
            "-t", "tgt.png", "-steps", "101", "-noise", "0.001",
            "-lr_attack", "0.02", "-e", "8", "--mask_loc", "1", "2", "3", "4",
            "-la_bkg_in", "0.5", "-la_tar", "2.0", "--defend",
            "--defend_m", "resize", "--debug", "--no-clamp", "-random", "3",
            "-ssteps", "5", "-re", "10", "-p", "64", "--adv",
        ]
    )
    assert cfg.model == "hyper" and cfg.quality == 2
    assert cfg.mask_loc == [1, 2, 3, 4]
    assert cfg.clamp is False and cfg.debug and cfg.defend and cfg.adv
    assert cfg.method == "resize" and cfg.random == 3
    assert cfg.search_steps == 5 and cfg.recompress == 10 and cfg.pad == 64


def test_config_defaults_match_reference():
    cfg = parse_config([])
    # reference defaults (coder.py:166-219)
    assert cfg.steps == 1001 and cfg.lr_attack == 0.01
    assert cfg.noise == 0.0001 and cfg.epsilon == 16.0
    assert cfg.model == "hyper" and cfg.metric == "ms-ssim" and cfg.quality == 3
    assert cfg.clamp is True and cfg.lamb_attack == 0.2


def test_fp16_msgpack_checkpoint_roundtrip(tmp_path):
    """Demo ckpts may be stored float16 (ADVICE r2); load_model must restore
    the compute dtype and values within half precision."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from imagecompression_adversarial_tpu.config import Config
    from imagecompression_adversarial_tpu.models import init_model, init_params
    from imagecompression_adversarial_tpu.runtime import load_model, save_params

    module = init_model("debug", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    path = str(tmp_path / "demo.msgpack")
    save_params(params, path, dtype=jnp.float16)

    cfg = Config(model="debug", quality=1, checkpoint=path)
    _, loaded = load_model(cfg)
    leaves = jax.tree_util.tree_leaves(loaded)
    assert all(l.dtype == jnp.float32 for l in leaves)
    orig = jax.tree_util.tree_leaves(params)
    for a, b in zip(orig, leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)
