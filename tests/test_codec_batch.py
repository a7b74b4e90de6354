"""cli.codec --encode / --decode batch bitstream drivers
(ref `/root/reference/utils/metrics_compare/{encode,decode}.py`): encode a
glob to self-contained .bin containers, decode them back in a separate
codec instance, byte-identical container round-trip."""

import numpy as np
import pytest
from PIL import Image

from imagecompression_adversarial_tpu.cli.codec import (
    read_container,
    write_container,
)


def test_container_roundtrip(tmp_path):
    out = {
        "shape": (4, 6),
        "strings": [b"\x01\x02\x03", b"", b"\xff" * 9],
    }
    p = str(tmp_path / "x.bin")
    write_container(p, out, 100, 200)
    strings, shape, h, w = read_container(p)
    assert strings == out["strings"]
    assert shape == (4, 6) and (h, w) == (100, 200)


@pytest.mark.parametrize("arch", ["factorized"])
def test_encode_decode_glob(tmp_path, arch, monkeypatch):
    import jax

    from imagecompression_adversarial_tpu.cli.codec import main

    rng = np.random.RandomState(0)
    src = tmp_path / "src"
    src.mkdir()
    for i in range(2):
        Image.fromarray(
            rng.randint(0, 256, (64, 64, 3), np.uint8)
        ).save(src / f"im{i}.png")

    enc, dec = tmp_path / "enc", tmp_path / "dec"
    base = ["-m", arch, "-q", "1", "--new", "-device", "cpu"]
    main(base + ["--encode", "-s", str(src / "*.png"), "-t", str(enc)])
    bins = sorted(enc.glob("*.bin"))
    assert len(bins) == 2 and all(b.stat().st_size > 0 for b in bins)

    main(base + ["--decode", "-s", str(enc / "*.bin"), "-t", str(dec)])
    recs = sorted(dec.glob("*_rec.png"))
    assert len(recs) == 2
    for r in recs:
        arr = np.asarray(Image.open(r))
        assert arr.shape == (64, 64, 3)
