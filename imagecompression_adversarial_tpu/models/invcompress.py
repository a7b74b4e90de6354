"""Invertible-transform codec (the InvCompress family).

Re-design of the reference's InvCompress drop-ins
(`/root/reference/InvCompress/ours.py:13-98`, `our_utils.py:47-160`): the
analysis/synthesis pair is a single invertible network — four levels of
[space-to-depth squeeze -> invertible 1x1 conv -> 3 affine coupling layers]
(kernel 5 on the first two levels, 3 on the last two), producing a 768-ch
/16-resolution latent coded by a joint autoregressive entropy structure
(N_hyper = 768).  ``g_s`` is exactly ``g_a`` run in reverse.

Attacks plug in unchanged: the module exposes the same g_a/g_s/__call__
interface as every other codec family (the reference ports its attack by
copying files into the InvCompress repo, `attack_inv.py:204-218`; here it is
just another registry entry).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy.factorized import EntropyBottleneck
from ..entropy.gaussian import gaussian_conditional
from ..ops.quant import quantize
from .codecs import CodecModel, _maybe_rng
from .layers import Conv, MaskedConv, SubpelConv


def squeeze2(x: jax.Array) -> jax.Array:
    """Space-to-depth by 2 (glow ordering: channel-major, then f1, f2)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h2, w2, c, f1, f2
    return x.reshape(b, h // 2, w // 2, c * 4)


def unsqueeze2(x: jax.Array) -> jax.Array:
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * 2, w * 2, c)


class Bottleneck(nn.Module):
    """convK -> lrelu(0.2) -> conv1 -> lrelu -> convK (zero-init last)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        y = Conv(self.features, kernel_size=self.kernel_size, stride=1,
                 name="conv1")(x)
        y = nn.leaky_relu(y, 0.2)
        y = Conv(self.features, kernel_size=1, stride=1, name="conv2")(y)
        y = nn.leaky_relu(y, 0.2)
        # zero-init final conv: couplings start as identity (ref
        # `initialize_weights(self.conv3, 0)`)
        c_in = y.shape[-1]
        kernel = self.param(
            "conv3_kernel", nn.initializers.zeros,
            (self.kernel_size, self.kernel_size, c_in, self.features),
        )
        bias = self.param("conv3_bias", nn.initializers.zeros, (self.features,))
        pad = self.kernel_size // 2
        dn = jax.lax.conv_dimension_numbers(
            y.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            y, kernel.astype(y.dtype), (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=dn,
        )
        return y + bias.astype(y.dtype)


class CouplingLayer(nn.Module):
    """Affine coupling (ref `our_utils.py:119-146`):
    fwd: y1 = x1*exp(s(G2(x2))) + H2(x2); y2 = x2*exp(s(G1(y1))) + H1(y1)
    with s(v) = clamp * (2 sigmoid(v) - 1)."""

    split1: int
    split2: int
    kernel_size: int
    clamp: float = 1.0

    def setup(self):
        self.G1 = Bottleneck(self.split2, self.kernel_size)
        self.G2 = Bottleneck(self.split1, self.kernel_size)
        self.H1 = Bottleneck(self.split2, self.kernel_size)
        self.H2 = Bottleneck(self.split1, self.kernel_size)

    def _s(self, v):
        return jnp.exp(self.clamp * (2.0 * jax.nn.sigmoid(v) - 1.0))

    def __call__(self, x, rev: bool = False):
        x1 = x[..., : self.split1]
        x2 = x[..., self.split1 :]
        if not rev:
            y1 = x1 * self._s(self.G2(x2)) + self.H2(x2)
            y2 = x2 * self._s(self.G1(y1)) + self.H1(y1)
        else:
            y2 = (x2 - self.H1(x1)) / self._s(self.G1(x1))
            y1 = (x1 - self.H2(y2)) / self._s(self.G2(y2))
        return jnp.concatenate([y1, y2], axis=-1)


class InvertibleConv1x1(nn.Module):
    """Channel-mixing 1x1 conv with an exactly invertible weight."""

    features: int

    @nn.compact
    def __call__(self, x, rev: bool = False):
        def ortho_init(key, shape):
            w = jax.random.normal(key, shape)
            q, _ = jnp.linalg.qr(w)
            return q

        w = self.param("weight", ortho_init, (self.features, self.features))
        if rev:
            w = jnp.linalg.inv(w)
        return jnp.einsum("bhwi,io->bhwo", x, w.astype(x.dtype))


class InvComp(nn.Module):
    """Four squeeze/mix/couple levels: 3 -> 768 channels at /16."""

    def setup(self):
        c = 3
        specs = []
        for k in (5, 5, 3, 3):
            c *= 4
            specs.append((c, k))
        ops = []
        c = 3
        for lvl, (c4, k) in enumerate(specs):
            ops.append(
                (
                    InvertibleConv1x1(c4, name=f"mix_{lvl}"),
                    [
                        CouplingLayer(c4 // 4, 3 * c4 // 4, k,
                                      name=f"couple_{lvl}_{i}")
                        for i in range(3)
                    ],
                )
            )
        self._ops = ops

    def __call__(self, x, rev: bool = False):
        if not rev:
            for mix, couples in self._ops:
                x = squeeze2(x)
                x = mix(x)
                for cpl in couples:
                    x = cpl(x)
        else:
            for mix, couples in reversed(self._ops):
                for cpl in reversed(couples):
                    x = cpl(x, rev=True)
                x = mix(x, rev=True)
                x = unsqueeze2(x)
        return x


class InvCompress(CodecModel):
    """Invertible codec over the joint-autoregressive entropy structure
    (N_hyper = 768, ref `ours.py:21-55`)."""

    N: int = 192  # kept for registry symmetry; latent width is fixed at 768
    M: int = 768
    entropy_structure = "context"

    def setup(self):
        nh = self.M
        self.inv = InvComp()

        self.h_a_0 = Conv(nh, kernel_size=3, stride=1)
        self.h_a_2 = Conv(nh, kernel_size=3, stride=1)
        self.h_a_4 = Conv(nh, kernel_size=3, stride=2)
        self.h_a_6 = Conv(nh, kernel_size=3, stride=1)
        self.h_a_8 = Conv(nh, kernel_size=3, stride=2)

        self.h_s_0 = Conv(nh, kernel_size=3, stride=1)
        self.h_s_2 = SubpelConv(nh, upscale=2)
        self.h_s_4 = Conv(nh * 3 // 2, kernel_size=3, stride=1)
        self.h_s_6 = SubpelConv(nh * 3 // 2, upscale=2)
        self.h_s_8 = Conv(nh * 2, kernel_size=3, stride=1)

        self.context_prediction = MaskedConv(2 * nh)
        self.entropy_parameters_0 = Conv(nh * 10 // 3, kernel_size=1, stride=1)
        self.entropy_parameters_2 = Conv(nh * 8 // 3, kernel_size=1, stride=1)
        self.entropy_parameters_4 = Conv(nh * 6 // 3, kernel_size=1, stride=1)

        self.entropy_bottleneck = EntropyBottleneck(nh)

    def g_a(self, x):
        return self.inv(x)

    def g_s(self, y):
        return self.inv(y, rev=True)

    def h_a(self, y):
        h = nn.leaky_relu(self.h_a_0(y))
        h = nn.leaky_relu(self.h_a_2(h))
        h = nn.leaky_relu(self.h_a_4(h))
        h = nn.leaky_relu(self.h_a_6(h))
        return self.h_a_8(h)

    def h_s(self, z):
        h = nn.leaky_relu(self.h_s_0(z))
        h = nn.leaky_relu(self.h_s_2(h))
        h = nn.leaky_relu(self.h_s_4(h))
        h = nn.leaky_relu(self.h_s_6(h))
        return self.h_s_8(h)

    def entropy_parameters(self, v):
        v = nn.leaky_relu(self.entropy_parameters_0(v))
        v = nn.leaky_relu(self.entropy_parameters_2(v))
        return self.entropy_parameters_4(v)

    def __call__(self, x, quant_mode: str = "noise") -> Dict[str, Any]:
        y = self.g_a(x)
        z = self.h_a(y)
        rng = _maybe_rng(self, quant_mode)
        z_hat, z_lik = self.entropy_bottleneck(z, quant_mode=quant_mode, key=rng)
        params = self.h_s(z_hat)

        rng_y = _maybe_rng(self, quant_mode)
        y_hat = quantize(
            y,
            "dequantize" if quant_mode in ("dequantize", "ste") else quant_mode,
            means=None,
            key=rng_y,
        )
        ctx = self.context_prediction(y_hat)
        gaussian_params = self.entropy_parameters(
            jnp.concatenate([params, ctx], axis=-1)
        )
        scales, means = jnp.split(gaussian_params, 2, axis=-1)
        rng_lik = _maybe_rng(self, quant_mode)
        _, y_lik = gaussian_conditional(
            y, scales, means=means, quant_mode=quant_mode, key=rng_lik
        )
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "y": y,
            "y_hat": y_hat,
            "z_hat": z_hat,
            "scales_hat": scales,
            "means_hat": means,
            "likelihoods": {"y": y_lik, "z": z_lik},
        }

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()
