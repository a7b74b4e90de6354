"""Layer parity tests vs PyTorch's conv conventions.

These nail down the exact layout/padding/flip conventions our
PyTorch->JAX checkpoint converter depends on (SURVEY §7.3 "converter
fidelity"): a torch Conv2d / ConvTranspose2d / masked conv with weights W
must produce bit-identical (up to fp tolerance) outputs after converting W
into our HWIO kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from imagecompression_adversarial_tpu.models.layers import (
    Conv,
    Deconv,
    GDN,
    MaskedConv,
    pixel_shuffle,
)


def _rand(shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def torch_conv_weight_to_jax(w):
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def torch_deconv_weight_to_jax(w):
    """torch ConvTranspose2d weight (I, O, H, W) -> our (H, W, I, O)."""
    return np.transpose(w, (2, 3, 0, 1))


def test_conv_matches_torch():
    for k, s in [(5, 2), (3, 1), (3, 2), (1, 1)]:
        x = _rand((2, 16, 16, 4), seed=k * 10 + s)
        w = _rand((6, 4, k, k), seed=k + s)
        b = _rand((6,), seed=99)

        ref = F.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(w),
            torch.from_numpy(b),
            stride=s,
            padding=k // 2,
        ).permute(0, 2, 3, 1).numpy()

        mod = Conv(features=6, kernel_size=k, stride=s)
        params = {"kernel": jnp.array(torch_conv_weight_to_jax(w)), "bias": jnp.array(b)}
        out = mod.apply({"params": params}, jnp.array(x))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_deconv_matches_torch():
    for k, s in [(5, 2), (3, 1)]:
        x = _rand((2, 8, 8, 4), seed=k * 3 + s)
        w = _rand((4, 6, k, k), seed=k - s)  # (in, out, kh, kw)
        b = _rand((6,), seed=7)

        ref = F.conv_transpose2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(w),
            torch.from_numpy(b),
            stride=s,
            padding=k // 2,
            output_padding=s - 1,
        ).permute(0, 2, 3, 1).numpy()

        mod = Deconv(features=6, kernel_size=k, stride=s)
        params = {
            "kernel": jnp.array(torch_deconv_weight_to_jax(w)),
            "bias": jnp.array(b),
        }
        out = mod.apply({"params": params}, jnp.array(x))
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_gdn_matches_reference_math():
    """GDN forward vs a direct torch evaluation of the reference formula
    (reparam clamp -> square -> 1x1 conv of x^2 -> rsqrt)."""
    c = 8
    x = _rand((2, 4, 4, c), seed=1)
    beta_r = np.abs(_rand((c,), seed=2)) + 0.5
    gamma_r = np.abs(_rand((c, c), seed=3)) * 0.1 + 0.01

    pedestal = (2 ** -18) ** 2
    beta_bound = (1e-6 + pedestal) ** 0.5
    gamma_bound = 2 ** -18

    bt = np.clip(beta_r, beta_bound, None) ** 2 - pedestal
    gm = np.clip(gamma_r, gamma_bound, None) ** 2 - pedestal

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    norm = F.conv2d(xt ** 2, torch.from_numpy(gm).reshape(c, c, 1, 1),
                    torch.from_numpy(bt))
    ref_fwd = (xt * torch.rsqrt(norm)).permute(0, 2, 3, 1).numpy()
    ref_inv = (xt * torch.sqrt(norm)).permute(0, 2, 3, 1).numpy()

    params = {"beta": jnp.array(beta_r), "gamma": jnp.array(gamma_r)}
    out = GDN().apply({"params": params}, jnp.array(x))
    np.testing.assert_allclose(np.asarray(out), ref_fwd, rtol=1e-4, atol=1e-5)
    out_inv = GDN(inverse=True).apply({"params": params}, jnp.array(x))
    np.testing.assert_allclose(np.asarray(out_inv), ref_inv, rtol=1e-4, atol=1e-5)


def test_masked_conv_matches_torch_mask_a():
    x = _rand((1, 10, 10, 4), seed=4)
    w = _rand((8, 4, 5, 5), seed=5)
    b = _rand((8,), seed=6)

    mask = np.ones_like(w)
    mask[:, :, 5 // 2, 5 // 2:] = 0
    mask[:, :, 5 // 2 + 1:, :] = 0

    ref = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w * mask),
        torch.from_numpy(b),
        padding=2,
    ).permute(0, 2, 3, 1).numpy()

    mod = MaskedConv(features=8)
    params = {"kernel": jnp.array(torch_conv_weight_to_jax(w)), "bias": jnp.array(b)}
    out = mod.apply({"params": params}, jnp.array(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_masked_conv_is_causal():
    """Output at (i, j) must not depend on raster-order-future inputs."""
    mod = MaskedConv(features=2, kernel_size=5)
    x = jnp.zeros((1, 7, 7, 2))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]

    base = mod.apply({"params": params}, x)
    # perturb the center pixel: outputs at raster positions <= center unchanged
    x2 = x.at[0, 3, 3, :].set(10.0)
    out2 = mod.apply({"params": params}, x2)
    diff = np.abs(np.asarray(out2 - base)).sum(axis=-1)[0]
    assert diff[3, 3] == 0  # center cannot see itself (mask A)
    assert diff[:3].sum() == 0 and diff[3, :4].sum() == 0  # nor the past
    assert diff[3, 4:].sum() > 0 or diff[4:].sum() > 0  # but the future does


def test_pixel_shuffle_matches_torch():
    x = _rand((2, 3, 5, 16), seed=8)
    ref = F.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
    ref = ref.permute(0, 2, 3, 1).numpy()
    out = pixel_shuffle(jnp.array(x), 2)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_linear_gdn_matches_reference_math():
    """linear_GDN forward vs direct torch evaluation (ref utils/ops.py:104-118):
    clamp reparam values, linear |x| pool, divide (or multiply for inverse)."""
    from imagecompression_adversarial_tpu.models.layers import LinearGDN

    c = 6
    x = _rand((1, 3, 3, c), seed=11)
    beta_r = np.abs(_rand((c,), seed=12)) + 0.5
    gamma_r = np.abs(_rand((c, c), seed=13)) * 0.1 + 0.01

    pedestal = (2 ** -18) ** 2
    beta_bound = (1e-6 + pedestal) ** 0.5
    gamma_bound = 2 ** -18
    bt = np.clip(beta_r, beta_bound, None)
    gm = np.clip(gamma_r, gamma_bound, None)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    norm = F.conv2d(torch.abs(xt), torch.from_numpy(gm).reshape(c, c, 1, 1),
                    torch.from_numpy(bt))
    ref_fwd = (xt / norm).permute(0, 2, 3, 1).numpy()
    ref_inv = (xt * norm).permute(0, 2, 3, 1).numpy()

    params = {"beta": jnp.array(beta_r), "gamma": jnp.array(gamma_r)}
    out = LinearGDN().apply({"params": params}, jnp.array(x))
    np.testing.assert_allclose(np.asarray(out), ref_fwd, rtol=1e-4, atol=1e-5)
    out_inv = LinearGDN(inverse=True).apply({"params": params}, jnp.array(x))
    np.testing.assert_allclose(np.asarray(out_inv), ref_inv, rtol=1e-4, atol=1e-5)


def test_deconv_subpel_matches_standard():
    """The subpixel phase decomposition is the SAME linear map as the
    dilated-conv transposed conv (and as torch ConvTranspose2d)."""
    import jax
    import jax.numpy as jnp

    from imagecompression_adversarial_tpu.models.layers import Deconv

    for in_ch, out_ch, h, w in ((8, 3, 10, 14), (6, 5, 9, 7)):
        std = Deconv(out_ch, subpel=False)
        sub = Deconv(out_ch, subpel=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, h, w, in_ch))
        params = std.init(jax.random.PRNGKey(1), x)["params"]
        y_std = std.apply({"params": params}, x)
        y_sub = sub.apply({"params": params}, x)
        assert y_sub.shape == y_std.shape == (2, 2 * h, 2 * w, out_ch)
        np.testing.assert_allclose(
            np.asarray(y_sub), np.asarray(y_std), rtol=1e-5, atol=1e-5
        )

    # gradients agree too (the backward is what the layout fix targets)
    std3 = Deconv(3, subpel=False)
    sub3 = Deconv(3, subpel=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 6))
    params = std3.init(jax.random.PRNGKey(3), x)["params"]
    g_std = jax.grad(lambda x: jnp.sum(std3.apply({"params": params}, x) ** 2))(x)
    g_sub = jax.grad(lambda x: jnp.sum(sub3.apply({"params": params}, x) ** 2))(x)
    np.testing.assert_allclose(
        np.asarray(g_sub), np.asarray(g_std), rtol=1e-4, atol=1e-5
    )


def test_subpel_env_gate_preserves_codec_forward(monkeypatch):
    """ICAT_SUBPEL_DECONV=final must leave the hyper codec's outputs
    unchanged (the final 3-channel deconv flips to the subpixel form)."""
    import jax

    from imagecompression_adversarial_tpu.models import init_model, init_params

    module = init_model("hyper", 1)
    params = init_params(module, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))

    monkeypatch.delenv("ICAT_SUBPEL_DECONV", raising=False)
    base = module.apply({"params": params}, x, quant_mode="dequantize")["x_hat"]
    monkeypatch.setenv("ICAT_SUBPEL_DECONV", "final")
    sub = module.apply({"params": params}, x, quant_mode="dequantize")["x_hat"]
    np.testing.assert_allclose(
        np.asarray(sub), np.asarray(base), rtol=1e-5, atol=1e-5
    )
