"""Real-image data-path tests (VERDICT r2 weak #4): the folder loader,
dihedral augmentation, and prefetch generator driven over an actual tmp-dir
of PNGs instead of the synthetic fallback (ref loader semantics:
`/root/reference/train.py:98-152`)."""

import numpy as np
import pytest
from PIL import Image

from imagecompression_adversarial_tpu.train.data import (
    augment_dihedral,
    image_folder_batches,
    list_image_files,
    make_batches,
    prefetch,
    synthetic_batches,
)


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    """12 deterministic PNGs (10 usable at crop=32, 2 too small), nested
    one level deep like a Vimeo-style directory tree."""
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(10):
        sub = root / f"seq{i % 2}"
        sub.mkdir(exist_ok=True)
        arr = rng.randint(0, 256, (48, 40, 3), np.uint8)
        Image.fromarray(arr).save(sub / f"im{i:02d}.png")
    # too small for a 32-crop: must be skipped, not crash the stream
    for i in range(2):
        arr = rng.randint(0, 256, (16, 16, 3), np.uint8)
        Image.fromarray(arr).save(root / f"tiny{i}.png")
    return root


def test_list_image_files_recursive_sorted(png_dir):
    files = list_image_files(str(png_dir))
    assert len(files) == 12
    assert files == sorted(files)


def test_image_folder_batches_shapes_and_range(png_dir):
    it = image_folder_batches(str(png_dir), batch_size=4, crop=32, seed=0,
                              workers=2, epochs=1)
    batches = list(it)
    # 10 usable images, batch 4, drop-last -> 2 batches
    assert len(batches) == 2
    for b in batches:
        assert b.shape == (4, 32, 32, 3)
        assert b.dtype == np.float32
        assert 0.0 <= b.min() and b.max() <= 1.0


def test_image_folder_batches_seed_determinism(png_dir):
    a = list(image_folder_batches(str(png_dir), 4, crop=32, seed=7, epochs=1))
    b = list(image_folder_batches(str(png_dir), 4, crop=32, seed=7, epochs=1))
    c = list(image_folder_batches(str(png_dir), 4, crop=32, seed=8, epochs=1))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_image_folder_batches_multiple_epochs(png_dir):
    it = image_folder_batches(str(png_dir), 4, crop=32, seed=0, epochs=2)
    assert len(list(it)) == 4


def test_image_folder_batches_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        next(image_folder_batches(str(tmp_path / "nope"), 4))


def test_make_batches_prefers_real_folder(png_dir):
    b = next(iter(make_batches(str(png_dir), 2, crop=32)))
    assert b.shape == (2, 32, 32, 3)
    # non-existent root falls back to the synthetic stream
    s = next(iter(make_batches("/nonexistent/dir", 2, crop=32)))
    assert s.shape == (2, 32, 32, 3)


def test_augment_dihedral_is_pixel_preserving(png_dir):
    src = list(image_folder_batches(str(png_dir), 4, crop=32, seed=0, epochs=1))
    aug = list(augment_dihedral(iter(src), seed=3))
    assert len(aug) == len(src)
    changed = 0
    for a, s in zip(aug, src):
        assert a.shape == s.shape
        for i in range(s.shape[0]):
            # augmentation permutes pixels, never changes their values
            np.testing.assert_allclose(
                np.sort(a[i].ravel()), np.sort(s[i].ravel())
            )
            if not np.array_equal(a[i], s[i]):
                changed += 1
    assert changed > 0  # some variant other than identity was drawn


def test_augment_dihedral_deterministic():
    base = [b for b, _ in zip(synthetic_batches(2, crop=16, seed=1), range(3))]
    a = list(augment_dihedral(iter(base), seed=5))
    b = list(augment_dihedral(iter(base), seed=5))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_prefetch_preserves_order_and_exhausts(png_dir):
    src = list(image_folder_batches(str(png_dir), 4, crop=32, seed=0, epochs=1))
    out = list(prefetch(iter(src), depth=2))
    assert len(out) == len(src)
    for x, y in zip(out, src):
        np.testing.assert_array_equal(x, y)


def test_prefetch_propagates_nothing_after_sentinel():
    out = list(prefetch(iter([]), depth=1))
    assert out == []


def test_make_kodak24_corpus(tmp_path):
    """scripts/make_kodak24.py: 24 Kodak-geometry images, legacy 01/02 bytes."""
    import importlib.util
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "make_kodak24", "scripts/make_kodak24.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "kodak24"
    mod.main(str(out))

    from PIL import Image

    files = sorted(out.glob("kodim*.png"))
    assert len(files) == 24
    portrait = {4, 9, 10, 17, 18, 19}
    for f in files:
        idx = int(f.stem[5:])
        h, w = np.asarray(Image.open(f)).shape[:2]
        assert (h, w) == ((768, 512) if idx in portrait else (512, 768)), f.name

    # kodim01/02 must keep the round-1 verify-skill bytes (all committed
    # 2-image numbers in RESULTS.md were measured on them).
    rng = np.random.RandomState(0)
    for i in range(2):
        h, w = 512, 768
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.clip(
            np.stack([0.5 + 0.4 * np.sin(xx / 40.0 + i),
                      0.5 + 0.4 * np.cos(yy / 60.0),
                      0.5 + 0.2 * np.sin((xx + yy) / 30.0)], -1)
            + rng.rand(h, w, 3) * 0.05, 0, 1)
        ref = (img * 255).astype(np.uint8)
        got = np.asarray(Image.open(out / f"kodim{i + 1:02d}.png"))
        np.testing.assert_array_equal(ref, got)
