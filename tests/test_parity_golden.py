"""Parity-hardening golden tests (round-1 verdict item #9).

1. The EntropyBottleneck likelihood chain vs an independent torch replica of
   CompressAI's published `_logits_cumulative` math.
2. Converter key-path coverage for the cheng2020 and mbt2018 ("context")
   families: a synthetic state_dict with CompressAI's exact key naming is
   converted and strict-merged into the flax init template — any mis-mapped
   path or mis-transposed shape fails the merge.
3. Numeric subpel-conv parity (torch Sequential(conv, PixelShuffle) vs our
   SubpelConv through the converter).
"""

import re

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from imagecompression_adversarial_tpu.io.convert import convert_state_dict
from imagecompression_adversarial_tpu.models import init_model, init_params
from imagecompression_adversarial_tpu.runtime import _merge_strict


# --------------------------------------------------------------------- EB

def _torch_eb_likelihood(matrices, biases, factors, v):
    """CompressAI's EntropyBottleneck likelihood math, implemented fresh in
    torch from the published formulas (Balle 2018 appendix 6.1):
    logits chain of softplus(H) @ x + b with tanh(a)*tanh(.) residuals,
    likelihood = |sigmoid(s*upper) - sigmoid(s*lower)|, s = -sign(l+u)."""

    def logits(x):
        for k in range(len(matrices)):
            x = torch.matmul(F.softplus(matrices[k]), x) + biases[k]
            if k < len(matrices) - 1:
                x = x + torch.tanh(factors[k]) * torch.tanh(x)
        return x

    lower = logits(v - 0.5)
    upper = logits(v + 0.5)
    sign = -torch.sign(lower + upper)
    return torch.abs(torch.sigmoid(sign * upper) - torch.sigmoid(sign * lower))


def test_eb_likelihood_matches_torch_replica():
    from imagecompression_adversarial_tpu.entropy.factorized import eb_likelihood

    rng = np.random.RandomState(0)
    c, filters = 5, (3, 3, 3, 3)
    dims = (1,) + filters + (1,)
    params = {}
    t_mat, t_bias, t_fac = [], [], []
    for k in range(len(dims) - 1):
        m = rng.randn(c, dims[k + 1], dims[k]).astype(np.float32) * 0.5
        b = rng.randn(c, dims[k + 1], 1).astype(np.float32) * 0.5
        params[f"matrix_{k}"] = jnp.asarray(m)
        params[f"bias_{k}"] = jnp.asarray(b)
        t_mat.append(torch.from_numpy(m))
        t_bias.append(torch.from_numpy(b))
        if k < len(dims) - 2:
            f_ = rng.randn(c, dims[k + 1], 1).astype(np.float32) * 0.5
            params[f"factor_{k}"] = jnp.asarray(f_)
            t_fac.append(torch.from_numpy(f_))

    v = rng.randn(c, 1, 64).astype(np.float32) * 4
    ours = np.asarray(eb_likelihood(params, jnp.asarray(v)))
    theirs = _torch_eb_likelihood(t_mat, t_bias, t_fac, torch.from_numpy(v)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)
    assert (ours >= 0).all()


# ------------------------------------------------------- converter key sets

# CompressAI module layouts, stated independently of io/convert.py: which
# flax leaves are ConvTranspose2d in torch, and which tops are bare
# subpel_conv3x3 Sequentials (inner conv at torch index 0).
_DECONV = {
    "context": {"g_s_0", "g_s_2", "g_s_4", "g_s_6", "h_s_0", "h_s_2"},
    "cheng2020": set(),
}
_DIRECT_SUBPEL_TOPS = {
    "context": set(),
    "cheng2020": {"h_s_2", "h_s_6", "g_s_7"},
}


def _torch_key(path, arch):
    """Map a flax template path (tuple of str) to CompressAI's torch key."""
    top = path[0]
    if top == "entropy_bottleneck":
        leaf = path[1]
        if leaf == "quantiles":
            return "entropy_bottleneck.quantiles"
        kind, idx = leaf.rsplit("_", 1)
        return f"entropy_bottleneck._{kind}{idx}"
    m = re.match(r"^(g_a|g_s|h_a|h_s|entropy_parameters)_(\d+)$", top)
    base = f"{m.group(1)}.{m.group(2)}" if m else top
    comps = [base]
    prev = top
    for s in path[1:-1]:
        if s == "conv" and (
            prev in ("subpel_conv", "upsample")
            or (prev == top and top in _DIRECT_SUBPEL_TOPS[arch])
        ):
            comps.append("0")
        else:
            comps.append(s)
        prev = s
    leaf = {"kernel": "weight"}.get(path[-1], path[-1])
    return ".".join(comps + [leaf])


def _torch_tensor_for(path, leaf_shape, arch):
    """Random torch tensor whose converted layout matches the flax leaf."""
    rng = np.random.RandomState(abs(hash((path, arch))) % (2 ** 31))
    leaf = path[-1]
    if leaf == "kernel":
        kh, kw, i, o = leaf_shape
        if path[0] in _DECONV[arch]:
            arr = rng.randn(i, o, kh, kw)
        else:
            arr = rng.randn(o, i, kh, kw)
    elif leaf == "gamma":
        c0, c1 = leaf_shape
        arr = rng.randn(c0, c1, 1, 1)
    else:
        arr = rng.randn(*leaf_shape)
    return torch.from_numpy(arr.astype(np.float32))


@pytest.mark.parametrize("arch,model", [("context", "context"), ("cheng2020", "cheng2020")])
def test_converter_covers_full_key_set(arch, model):
    """Every CompressAI-named key converts onto the template; the merge is
    strict (no missing, no unexpected, shapes equal)."""
    module = init_model(model, 1)
    template = init_params(module, jax.random.PRNGKey(0))

    flat = jax.tree_util.tree_leaves_with_path(template)
    state = {}
    for path_keys, leaf in flat:
        path = tuple(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path_keys
        )
        state[_torch_key(path, arch)] = _torch_tensor_for(path, leaf.shape, arch)

    # derived buffers CompressAI checkpoints also carry — must be skipped
    state["entropy_bottleneck._quantized_cdf"] = torch.zeros(4, 10, dtype=torch.int32)
    state["entropy_bottleneck._offset"] = torch.zeros(4, dtype=torch.int32)
    state["entropy_bottleneck._cdf_length"] = torch.zeros(4, dtype=torch.int32)
    state["entropy_bottleneck.target"] = torch.zeros(3)
    state["gaussian_conditional.scale_table"] = torch.zeros(64)
    state["gaussian_conditional._quantized_cdf"] = torch.zeros(64, 10, dtype=torch.int32)
    state["context_prediction.mask"] = torch.zeros(1)

    converted = convert_state_dict(state, arch)
    merged = _merge_strict(template, converted, f"synthetic-{arch}")

    # spot-check a transpose numerically: conv kernel round-trips OIHW->HWIO
    t = state[_torch_key(("g_a_6", "kernel") if arch == "context"
                         else ("g_a_6", "kernel"), arch)].numpy()
    np.testing.assert_allclose(
        np.asarray(merged["g_a_6"]["kernel"]), t.transpose(2, 3, 1, 0)
    )


def test_subpel_conv_matches_torch_pixelshuffle():
    """torch subpel_conv3x3 (conv -> PixelShuffle) == our SubpelConv with
    converted weights (covers the `subpel_conv.0` -> `conv` mapping)."""
    from imagecompression_adversarial_tpu.models.layers import SubpelConv

    torch.manual_seed(0)
    cin, cout, r = 6, 4, 2
    tmod = nn.Sequential(nn.Conv2d(cin, cout * r * r, 3, 1, 1), nn.PixelShuffle(r))
    x = torch.rand(1, cin, 8, 8)
    with torch.no_grad():
        y_t = tmod(x)

    module = SubpelConv(cout, upscale=r)
    params = {
        "conv": {
            "kernel": jnp.asarray(
                tmod[0].weight.detach().numpy().transpose(2, 3, 1, 0)
            ),
            "bias": jnp.asarray(tmod[0].bias.detach().numpy()),
        }
    }
    y_j = module.apply({"params": params}, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(
        np.asarray(y_j), y_t.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-6
    )
