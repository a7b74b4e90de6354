"""cli.mmd — the reference's standalone KID/FID/IS evaluator
(`/root/reference/utils/metrics_compare/mmd.py:371-440`) over image globs
or cached feature codes."""

import numpy as np
import pytest
from PIL import Image

from imagecompression_adversarial_tpu.cli.mmd import main


@pytest.fixture()
def image_dirs(tmp_path):
    rng = np.random.RandomState(0)
    for sub in ("a", "b"):
        d = tmp_path / sub
        d.mkdir()
        for i in range(6):
            arr = rng.randint(0, 256, (64, 64, 3), np.uint8)
            if sub == "b":  # distinct distribution: darken
                arr = (arr * 0.5).astype(np.uint8)
            Image.fromarray(arr).save(d / f"im{i}.png")
    return tmp_path


def test_fid_kid_is_over_globs(image_dirs, tmp_path):
    out = tmp_path / "res.json"
    res = main([
        str(image_dirs / "a" / "*.png"), str(image_dirs / "b" / "*.png"),
        "--do-fid", "--do-mmd", "--mmd-subsets", "3",
        "--mmd-subset-size", "4", "-device", "cpu",
        "-o", str(out),
    ])
    assert res["fid"] > 0 and out.exists()
    assert res["n_samples"] == res["n_reference"] == 6
    assert len(res["kid"]) == 2 and len(res["is"]) == 2


def test_identical_sets_score_zero(image_dirs):
    res = main([
        str(image_dirs / "a" / "*.png"), str(image_dirs / "a" / "*.png"),
        "--do-fid", "--no-inception", "-device", "cpu",
    ])
    assert abs(res["fid"]) < 1e-3


def test_code_cache_roundtrip(image_dirs, tmp_path):
    codes = tmp_path / "codes.npy"
    first = main([
        str(image_dirs / "a" / "*.png"), "--save-codes", str(codes),
        "--no-inception", "-device", "cpu",
    ])
    # 2-D .npy is consumed as precomputed codes (reference --load-codes)
    second = main([
        str(codes), str(image_dirs / "a" / "*.png"),
        "--do-fid", "--no-inception", "-device", "cpu",
    ])
    assert first["n_samples"] == second["n_samples"] == 6
    assert abs(second["fid"]) < 1e-3


def test_alex_feature_backend(image_dirs):
    res = main([
        str(image_dirs / "a" / "*.png"), str(image_dirs / "b" / "*.png"),
        "--model", "alex", "--do-fid", "--no-inception", "-device", "cpu",
    ])
    assert res["model"] == "alex" and res["fid"] > 0
