"""End-to-end converter parity: a CompressAI-named torch transform vs the
converted JAX codec.

Builds the bmshj2018 analysis/synthesis pair in raw torch (Conv/
ConvTranspose + the GDN recipe verified in test_layers), exports a
state_dict with CompressAI's names, converts with `io.convert`, and checks
g_a / g_s agree numerically — the offline stand-in for golden tests against
zoo checkpoints (no model downloads in this sandbox)."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from imagecompression_adversarial_tpu.io.convert import convert_state_dict
from imagecompression_adversarial_tpu.models import init_model, init_params


class TorchGDN(nn.Module):
    """The GDN forward used by CompressAI-style codecs (reparametrized
    beta/gamma, verified against our GDN in test_layers.py)."""

    def __init__(self, c, inverse=False):
        super().__init__()
        self.inverse = inverse
        pedestal = (2 ** -18) ** 2
        self.register_parameter(
            "beta", nn.Parameter(torch.sqrt(torch.ones(c) + pedestal))
        )
        self.register_parameter(
            "gamma",
            nn.Parameter(torch.sqrt(0.1 * torch.eye(c) + pedestal).reshape(c, c, 1, 1)),
        )

    def forward(self, x):
        pedestal = (2 ** -18) ** 2
        beta = torch.clamp(self.beta, min=(1e-6 + pedestal) ** 0.5) ** 2 - pedestal
        gamma = torch.clamp(self.gamma, min=2 ** -18) ** 2 - pedestal
        norm = F.conv2d(x ** 2, gamma, beta)
        return x * torch.rsqrt(norm) if not self.inverse else x * torch.sqrt(norm)


def _build_torch_transforms(n, m, seed=0):
    torch.manual_seed(seed)
    g_a = nn.Sequential(
        nn.Conv2d(3, n, 5, 2, 2), TorchGDN(n),
        nn.Conv2d(n, n, 5, 2, 2), TorchGDN(n),
        nn.Conv2d(n, n, 5, 2, 2), TorchGDN(n),
        nn.Conv2d(n, m, 5, 2, 2),
    )
    g_s = nn.Sequential(
        nn.ConvTranspose2d(m, n, 5, 2, 2, 1), TorchGDN(n, inverse=True),
        nn.ConvTranspose2d(n, n, 5, 2, 2, 1), TorchGDN(n, inverse=True),
        nn.ConvTranspose2d(n, n, 5, 2, 2, 1), TorchGDN(n, inverse=True),
        nn.ConvTranspose2d(n, 3, 5, 2, 2, 1),
    )
    # perturb params away from init so the test is non-trivial
    with torch.no_grad():
        for p in list(g_a.parameters()) + list(g_s.parameters()):
            p.add_(0.01 * torch.randn_like(p))
    return g_a, g_s


def test_converted_transforms_match_torch_forward():
    n, m = 32, 48  # small widths keep the test fast; structure is identical
    g_a, g_s = _build_torch_transforms(n, m)

    # CompressAI naming: g_a.0.weight, g_a.1.beta, ...
    state = {}
    for prefix, seq in (("g_a", g_a), ("g_s", g_s)):
        for i, layer in enumerate(seq):
            for pname, val in layer.named_parameters():
                state[f"{prefix}.{i}.{pname}"] = val.detach()

    params = convert_state_dict(state, "factorized")

    # run torch
    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        y_t = g_a(x.double().float())
        x_rec_t = g_s(y_t)

    # run converted JAX (only transform params present; entropy model unused)
    from imagecompression_adversarial_tpu.models.codecs import FactorizedPrior

    module = FactorizedPrior(N=n, M=m)
    full = init_params(module, jax.random.PRNGKey(0))
    for k, v in params.items():
        full[k] = jax.tree_util.tree_map(jnp.asarray, v)

    xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    y_j = module.apply({"params": full}, xj, method=module.g_a)
    x_rec_j = module.apply({"params": full}, y_j, method=module.g_s)

    np.testing.assert_allclose(
        np.asarray(y_j), y_t.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(x_rec_j), x_rec_t.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_converter_rejects_mismatched_checkpoint():
    from imagecompression_adversarial_tpu.runtime import _merge_strict

    module = init_model("factorized", 1)
    template = init_params(module, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        _merge_strict(template, {"g_a_0": {"kernel": np.zeros((1,))}}, "x")


def test_converter_handles_legacy_net_prefix_and_container():
    n, m = 16, 24
    g_a, _ = _build_torch_transforms(n, m, seed=1)
    state = {}
    for i, layer in enumerate(g_a):
        for pname, val in layer.named_parameters():
            state[f"net.g_a.{i}.{pname}"] = val.detach()
    out = convert_state_dict({"state_dict": state}, "factorized")
    assert "g_a_0" in out and "kernel" in out["g_a_0"]
    assert out["g_a_0"]["kernel"].shape == (5, 5, 3, n)
