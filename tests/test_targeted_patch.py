"""Targeted/ROI attack, patch extraction, and classifier tests."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecompression_adversarial_tpu.attacks.patch import (
    extract_worst_patch,
    local_vi_map,
)
from imagecompression_adversarial_tpu.attacks.targeted import (
    TargetedAttackConfig,
    make_targeted_attack_fn,
    roi_masks,
)
from imagecompression_adversarial_tpu.models import init_model, init_params
from imagecompression_adversarial_tpu.models.classifier import (
    MLPClassifier,
    make_logits_fn,
)


def test_roi_masks():
    tar, bkg = roi_masks((1, 8, 8, 3), (2, 5, 1, 4))  # x0 x1 y0 y1
    assert float(tar[0, 1, 2, 0]) == 1.0  # inside box
    assert float(tar[0, 0, 0, 0]) == 0.0  # outside
    np.testing.assert_allclose(np.asarray(tar + bkg), 1.0)


def test_targeted_attack_moves_output_toward_target():
    module = init_model("debug", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 192, 192, 3))
    target = jnp.zeros_like(x)  # drive reconstruction toward black

    cfg = TargetedAttackConfig(steps=30, noise_threshold=1.0)  # budget off
    attack = make_targeted_attack_fn(module, cfg)
    res = attack(params, x, target)
    res0 = attack(params, x, None)
    # targeted loss decreased the distance to the target below the
    # untargeted run's output distance
    d_t = float(jnp.mean((res["output_"] - target) ** 2))
    d_u = float(jnp.mean((res0["output_"] - target) ** 2))
    assert np.isfinite(d_t) and np.isfinite(d_u)
    assert d_t < d_u


def test_masked_attack_runs():
    module = init_model("debug", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 192, 192, 3))
    cfg = TargetedAttackConfig(
        steps=5, mask_loc=(50, 120, 40, 100), lamb_tar=2.0, lamb_bkg_in=0.5
    )
    attack = make_targeted_attack_fn(module, cfg)
    res = attack(params, x, jnp.zeros_like(x))
    assert np.isfinite(float(res["loss_o_final"]))


def test_local_vi_map_and_patch_extraction():
    h, w = 192, 256
    im_s = jnp.zeros((1, h, w, 3))
    im_adv = im_s.at[0, 100:110, 150:160, :].set(0.1)  # small input change
    out_s = jnp.zeros((1, h, w, 3))
    out_adv = out_s.at[0, 100:110, 150:160, :].set(0.9)  # big output change

    vi = local_vi_map(im_adv, out_adv, im_s, out_s)
    assert vi.shape == ((h - 64) // 2 + 1, (w - 64) // 2 + 1)
    patches = extract_worst_patch(im_adv, out_adv, im_s, out_s)
    y0, x0 = np.asarray(patches["location"])
    # the worst patch must cover the perturbed region
    assert y0 <= 100 < y0 + 64 and x0 <= 150 < x0 + 64
    assert patches["patch_adv"].shape == (1, 64, 64, 3)
    # border zeroing: patch index is at least 10 strides in
    assert y0 >= 20 and x0 >= 20


def test_classifier_and_logits_fn():
    module = MLPClassifier()
    x = jnp.zeros((2, 28, 28, 3))
    params = module.init(jax.random.PRNGKey(0), x)["params"]
    logits = module.apply({"params": params}, x)
    assert logits.shape == (2, 10)

    # codec-resolution input goes through the resize adapter
    fn = make_logits_fn(module, params)
    big = jnp.zeros((2, 192, 192, 3))
    assert fn(big).shape == (2, 10)


def test_attack_cv_cls_ckpt_roundtrip(tmp_path):
    """--cls_ckpt loads a serialized classifier via the template-init path
    and yields a logits fn usable at codec resolution."""
    import flax.serialization

    from imagecompression_adversarial_tpu.cli.attack_cv import (
        _load_classifier_logits_fn,
    )

    module = MLPClassifier()
    params = module.init(
        jax.random.PRNGKey(1), np.zeros((1, 28, 28, 3), np.float32)
    )["params"]
    path = tmp_path / "cls.msgpack"
    path.write_bytes(flax.serialization.to_bytes(params))

    fn = _load_classifier_logits_fn(str(path))
    logits = fn(jnp.zeros((1, 64, 64, 3)))
    assert logits.shape == (1, 10)
    np.testing.assert_allclose(
        np.asarray(logits),
        np.asarray(make_logits_fn(module, params)(jnp.zeros((1, 64, 64, 3)))),
        atol=1e-6,
    )


def test_classifier_targeted_attack():
    codec = init_model("debug", 1)
    params = init_params(codec, jax.random.PRNGKey(0))
    clf = MLPClassifier()
    cx = jnp.zeros((1, 28, 28, 3))
    cparams = clf.init(jax.random.PRNGKey(1), cx)["params"]
    logits_fn = make_logits_fn(clf, cparams)

    cfg = TargetedAttackConfig(steps=5, noise_threshold=1.0)
    attack = make_targeted_attack_fn(
        codec, cfg, classifier_logits_fn=logits_fn, target_label=3
    )
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 192, 192, 3))
    res = attack(params, x)
    assert np.isfinite(float(res["loss_o_final"]))
