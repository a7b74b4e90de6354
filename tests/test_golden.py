"""Golden-value regression tests against the committed trained checkpoint.

`ckpts/demo/hyper-q4-mse-synthetic.msgpack` was trained in-round on the
deterministic synthetic stream (RESULTS.md).  These tests pin the
reconstruction quality, rate, attack VI behaviour, and real-coder agreement
so a future refactor that silently changes numerics fails loudly — the
sandbox stand-in for golden tests vs CompressAI zoo checkpoints.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecompression_adversarial_tpu.config import Config
from imagecompression_adversarial_tpu.metrics import bpp_from_likelihoods, psnr
from imagecompression_adversarial_tpu.runtime import load_model
from imagecompression_adversarial_tpu.train.data import synthetic_batches

CKPT = os.path.join(
    os.path.dirname(__file__), "..", "ckpts", "demo",
    "hyper-q4-mse-synthetic.msgpack",
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="demo checkpoint not present"
)


def _load():
    cfg = Config(model="hyper", quality=4, metric="mse", checkpoint=CKPT)
    return load_model(cfg)


def test_golden_reconstruction_quality():
    module, params = _load()
    x = jnp.asarray(next(synthetic_batches(1, crop=256, seed=1234)))
    out = module.apply({"params": params}, x, quant_mode="dequantize")
    p = float(psnr(jnp.clip(out["x_hat"], 0, 1), x))
    bpp = float(bpp_from_likelihoods(out["likelihoods"], 256 * 256))
    # measured on TPU: 28.997 dB @ 0.3303 bpp (RESULTS.md)
    assert 28.2 < p < 29.8, p
    assert 0.31 < bpp < 0.35, bpp


def test_golden_attack_amplifies_error():
    from imagecompression_adversarial_tpu.attacks import (
        RDAttackConfig,
        make_attack_fn,
    )

    module, params = _load()
    x = jnp.asarray(next(synthetic_batches(1, crop=256, seed=1234)))
    # short attack for test budget; VI must already be clearly positive
    attack = make_attack_fn(module, RDAttackConfig(steps=120))
    res = attack(params, x)
    assert float(res["vi"]) > 2.0, float(res["vi"])
    assert float(res["mse_in"]) <= 1.2e-4


def test_golden_real_coder_agreement():
    from imagecompression_adversarial_tpu.entropy.codec import RealCodec

    module, params = _load()
    x = np.asarray(next(synthetic_batches(1, crop=256, seed=1234)))
    codec = RealCodec(module, params)
    comp = codec.compress(x)
    real_bpp = codec.real_bpp(comp, 256 * 256)
    ref = module.apply({"params": params}, jnp.asarray(x), quant_mode="dequantize")
    est_bpp = float(bpp_from_likelihoods(ref["likelihoods"], 256 * 256))
    # real bitstream within 3% of the entropy estimate on a trained model
    assert abs(real_bpp - est_bpp) / est_bpp < 0.03, (real_bpp, est_bpp)
    x_hat = codec.decompress(comp["strings"], comp["shape"])
    np.testing.assert_allclose(
        x_hat, np.clip(np.asarray(ref["x_hat"]), 0, 1), atol=1e-5
    )


AUG_CKPT = os.path.join(
    os.path.dirname(__file__), "..", "ckpts", "demo",
    "hyper-q4-mse-augmented.msgpack",
)


@pytest.mark.skipif(not os.path.exists(AUG_CKPT), reason="augmented ckpt absent")
def test_golden_ensemble_defense_helps_augmented_model():
    """On the dihedral-augmented checkpoint the self-ensemble defense must
    not hurt (RESULTS.md: 6.95 -> 6.58 dB at full attack strength)."""
    from imagecompression_adversarial_tpu.attacks import (
        RDAttackConfig,
        make_attack_fn,
    )
    from imagecompression_adversarial_tpu.defenses import make_defend_fn

    cfg = Config(model="hyper", quality=4, metric="mse", checkpoint=AUG_CKPT)
    module, params = load_model(cfg)
    x = jnp.asarray(next(synthetic_batches(1, crop=256, seed=1234)))

    plain = make_attack_fn(module, RDAttackConfig(steps=120))(params, x)
    defended = make_attack_fn(
        module, RDAttackConfig(steps=120),
        defend_fn_builder=lambda f: make_defend_fn(f, "ensemble"),
    )(params, x)
    # allow a small tolerance: short-attack VI is noisier than the 1001-step run
    assert float(defended["vi"]) <= float(plain["vi"]) + 0.3
