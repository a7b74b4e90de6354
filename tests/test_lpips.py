"""LPIPS perceptual metric + lpips training-loss branch tests
(ref `/root/reference/train.py:47,92-94`)."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecompression_adversarial_tpu.metrics.lpips import make_lpips_fn
from imagecompression_adversarial_tpu.train.loss import rate_distortion_loss


def test_lpips_identity_is_zero_and_symmetric():
    fn = make_lpips_fn(seed=0)
    a = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    b = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    assert float(fn(a, a)) == 0.0
    dab, dba = float(fn(a, b)), float(fn(b, a))
    assert dab > 0
    np.testing.assert_allclose(dab, dba, rtol=1e-5)


def test_lpips_orders_perturbation_magnitude():
    fn = make_lpips_fn(seed=0)
    a = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3), minval=0.2, maxval=0.8)
    n = jax.random.normal(jax.random.PRNGKey(4), a.shape) * 0.01
    small = float(fn(a, a + n))
    large = float(fn(a, a + 10 * n))
    assert 0 < small < large


def test_lpips_is_differentiable_and_jittable():
    fn = make_lpips_fn(seed=0)
    a = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))
    b = jnp.clip(a + 0.1, 0, 1)
    g = jax.jit(jax.grad(lambda x: fn(x, b)))(a)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_rd_loss_lpips_branch_trains():
    likelihoods = {"y": jnp.full((1, 4, 4, 8), 0.5)}
    target = jax.random.uniform(jax.random.PRNGKey(6), (1, 64, 64, 3))
    result = {
        "x_hat": jnp.clip(target + 0.05, 0, 1),
        "likelihoods": likelihoods,
    }
    out = rate_distortion_loss(result, target, lmbda=1.0, metric="lpips")
    assert np.isfinite(float(out["loss"]))
    assert float(out["distortion"]) > 0
    # differentiable end-to-end through x_hat
    g = jax.grad(
        lambda xh: rate_distortion_loss(
            {"x_hat": xh, "likelihoods": likelihoods}, target, 1.0, "lpips"
        )["loss"]
    )(result["x_hat"])
    assert np.isfinite(np.asarray(g)).all()


def test_hific_generator_loss_accepts_lpips():
    from imagecompression_adversarial_tpu.train.gan import hific_generator_loss

    fn = make_lpips_fn(seed=1)
    target = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3))
    result = {
        "x_hat": jnp.clip(target + 0.02, 0, 1),
        "likelihoods": {"y": jnp.full((1, 4, 4, 8), 0.5)},
    }
    fake_logits = jnp.zeros((1, 4, 4, 1))
    total, logs = hific_generator_loss(result, target, fake_logits, perceptual_fn=fn)
    assert np.isfinite(float(total))
    assert float(logs["perceptual"]) > 0


def test_converted_torch_weights_match_torch_replica():
    """VERDICT r4 #8: exercise the converted-weights path with a FABRICATED
    torch LPIPS(alex) state_dict (the parity_vs_compressai --self-test
    trick): convert -> load -> assert parity against a torch replica of the
    exact trunk+head formula, so real lpips weights drop in unchanged the
    day egress exists."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    from imagecompression_adversarial_tpu.io.convert_lpips import (
        lpips_params_from_torch,
    )
    from imagecompression_adversarial_tpu.metrics.lpips import (
        lpips_fn_from_params,
    )

    torch.manual_seed(0)
    widths = [64, 192, 384, 256, 256]
    kspecs = [(11, 4, 2), (5, 1, 2), (3, 1, 1), (3, 1, 1), (3, 1, 1)]
    slices = ["net.slice1.0", "net.slice2.3", "net.slice3.6",
              "net.slice4.8", "net.slice5.10"]
    state = {
        "scaling_layer.shift": torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1),
        "scaling_layer.scale": torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1),
    }
    cin = 3
    for name, w, (k, _, _) in zip(slices, widths, kspecs):
        state[f"{name}.weight"] = torch.randn(w, cin, k, k) * 0.05
        state[f"{name}.bias"] = torch.randn(w) * 0.05
        cin = w
    for i, w in enumerate(widths):
        state[f"lin{i}.model.1.weight"] = torch.rand(1, w, 1, 1) * 0.1

    def torch_trunk(x):  # x: (N, 3, H, W) in [-1, 1]
        x = (x - state["scaling_layer.shift"]) / state["scaling_layer.scale"]
        feats = []
        for li, (name, (k, s, p)) in enumerate(zip(slices, kspecs)):
            x = F.relu(F.conv2d(x, state[f"{name}.weight"],
                                state[f"{name}.bias"], stride=s, padding=p))
            feats.append(x)
            if li in (0, 1):
                x = F.max_pool2d(x, 3, 2)
        return feats

    def torch_lpips(a_nhwc, b_nhwc):
        ta = torch.tensor(a_nhwc.transpose(0, 3, 1, 2)) * 2.0 - 1.0
        tb = torch.tensor(b_nhwc.transpose(0, 3, 1, 2)) * 2.0 - 1.0
        total = torch.tensor(0.0)
        for i, (xa, xb) in enumerate(zip(torch_trunk(ta), torch_trunk(tb))):
            na = xa * (xa * xa).sum(1, keepdim=True).add(1e-10).rsqrt()
            nb = xb * (xb * xb).sum(1, keepdim=True).add(1e-10).rsqrt()
            w = state[f"lin{i}.model.1.weight"].abs().view(1, -1, 1, 1)
            total = total + (w * (na - nb) ** 2).sum(1).mean()
        return float(total)

    params = lpips_params_from_torch(state)
    fn = lpips_fn_from_params(params)

    rng = np.random.RandomState(0)
    a = rng.rand(2, 64, 64, 3).astype(np.float32)
    b = np.clip(a + rng.randn(2, 64, 64, 3).astype(np.float32) * 0.05, 0, 1)
    ours = float(fn(a, b))
    ref = torch_lpips(a, b)
    assert abs(ours - ref) < 1e-4 + 1e-4 * abs(ref), (ours, ref)
    # identical inputs -> zero distance through the converted weights too
    assert float(fn(a, a)) < 1e-6


def test_alex_feature_fn_serves_fid():
    """The converted trunk doubles as the FID/KID feature extractor."""
    import numpy as np

    from imagecompression_adversarial_tpu.metrics.fid import frechet_distance
    from imagecompression_adversarial_tpu.metrics.lpips import (
        alex_feature_fn_from_params,
        make_lpips_fn,
        LPIPS,
    )
    import jax
    import jax.numpy as jnp

    module = LPIPS()
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x0, x0)["params"]
    fn = alex_feature_fn_from_params(params)
    rng = np.random.RandomState(0)
    a = rng.rand(8, 64, 64, 3).astype(np.float32)
    feats = fn(a)
    assert feats.shape == (8, 256) and np.isfinite(feats).all()
    # FID(a, a) == 0 through the same extractor
    fid_same = frechet_distance(feats, feats)
    assert abs(fid_same) < 1e-4


def test_lin_only_checkpoint_requires_base_params():
    """The distributed lin-only weight files need a trunk to merge into;
    without one the converter raises a descriptive error, with one it
    produces a loadable pytree."""
    import numpy as np
    import pytest
    import jax
    import jax.numpy as jnp

    from imagecompression_adversarial_tpu.io.convert_lpips import (
        lpips_params_from_torch,
    )
    from imagecompression_adversarial_tpu.metrics.lpips import LPIPS

    widths = [64, 192, 384, 256, 256]
    lin_only = {
        f"lin{i}.model.1.weight": np.random.RandomState(i).rand(1, w, 1, 1)
        for i, w in enumerate(widths)
    }
    with pytest.raises(ValueError, match="lin-only"):
        lpips_params_from_torch(lin_only)

    module = LPIPS()
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    base = module.init(jax.random.PRNGKey(0), x0, x0)["params"]
    params = lpips_params_from_torch(lin_only, base_params=base)
    d = module.apply({"params": params}, x0, x0)
    assert float(d) == 0.0
