"""HiFiC-family GAN codec (generative image compression) in flax.

Re-design of the reference's patched HiFiC (TensorFlow 1 + tensorflow_
compression, `/root/reference/HiFiC/archs.py`):
  * Encoder: conv7x7(60) + 4x strided conv3x3 (120/240/480/960) with
    ChannelNorm+ReLU, bottleneck conv3x3 -> 220-ch latent (`archs.py:68-109`)
  * Generator: ChannelNorm head -> 9 residual blocks (960 ch) with a long
    skip -> 4x ConvTranspose upsampling -> conv7x7 RGB (`archs.py:112-176`)
  * Patch discriminator conditioned on the (upsampled) latent
    (`archs.py:301-424`): latent -> 1x1x12 conv + nearest-resize concat,
    then 4 strided 4x4 convs (64..512, spectral-norm) -> per-patch logits
  * mean-scale hyperprior over y.

The reference adds an attack mode to this codec (`HiFiC/attack_hific.py`);
here it is a registry entry ('-m hific') and every attack engine applies
unchanged.  GAN training utilities (non-saturating losses) live in
`train.gan`.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy.factorized import EntropyBottleneck
from ..entropy.gaussian import gaussian_conditional
from .codecs import CodecModel, _maybe_rng
from .layers import Conv, Deconv


class ChannelNorm(nn.Module):
    """Normalize over the channel axis per spatial position + affine."""

    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        return x * gamma + beta


class HiFiCResidualBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = Conv(self.features, kernel_size=3, stride=1, name="conv1")(x)
        y = ChannelNorm(name="norm1")(y)
        y = nn.relu(y)
        y = Conv(self.features, kernel_size=3, stride=1, name="conv2")(y)
        y = ChannelNorm(name="norm2")(y)
        return x + y


class HiFiCEncoder(nn.Module):
    base: int = 60
    bottleneck: int = 220
    num_down: int = 4

    @nn.compact
    def __call__(self, x):
        y = Conv(self.base, kernel_size=7, stride=1, name="head")(x)
        y = ChannelNorm(name="head_norm")(y)
        y = nn.relu(y)
        for i in range(self.num_down):
            y = Conv(self.base * 2 ** (i + 1), kernel_size=3, stride=2,
                     name=f"down_{i}")(y)
            y = ChannelNorm(name=f"down_norm_{i}")(y)
            y = nn.relu(y)
        return Conv(self.bottleneck, kernel_size=3, stride=1, name="tail")(y)


class HiFiCGenerator(nn.Module):
    base: int = 60
    num_up: int = 4
    num_residual_blocks: int = 9

    @nn.compact
    def __call__(self, y):
        wide = self.base * 2 ** self.num_up
        h = ChannelNorm(name="head_norm0")(y)
        h = Conv(wide, kernel_size=3, stride=1, name="head")(h)
        h = ChannelNorm(name="head_norm1")(h)
        res = h
        for i in range(self.num_residual_blocks):
            res = HiFiCResidualBlock(wide, name=f"block_{i}")(res)
        h = h + res  # long skip (ref `archs.py:172-175`)
        for scale in reversed(range(self.num_up)):
            h = Deconv(self.base * 2 ** scale, kernel_size=3, stride=2,
                       name=f"up_{scale}")(h)
            h = ChannelNorm(name=f"up_norm_{scale}")(h)
            h = nn.relu(h)
        return Conv(3, kernel_size=7, stride=1, name="tail")(h)


class HiFiCDiscriminator(nn.Module):
    """Latent-conditioned patch discriminator (spectral-normalized)."""

    base: int = 64

    @nn.compact
    def __call__(self, x, y_latent, train: bool = True):
        b, h, w, _ = x.shape
        lat = Conv(12, kernel_size=3, stride=1, name="latent_proj")(y_latent)
        lat = nn.leaky_relu(lat, 0.2)
        lat = jax.image.resize(lat, (b, h, w, 12), method="nearest")
        net = jnp.concatenate([x, lat], axis=-1)

        widths = [self.base, self.base * 2, self.base * 4, self.base * 8]
        for i, wdt in enumerate(widths):
            conv = nn.SpectralNorm(
                nn.Conv(wdt, (4, 4), strides=(2, 2), padding="SAME",
                        name=f"conv_{i}")
            )
            net = conv(net, update_stats=train)
            net = nn.leaky_relu(net, 0.2)
        logits = nn.SpectralNorm(
            nn.Conv(1, (1, 1), name="logits")
        )(net, update_stats=train)
        return logits  # (B, H/16, W/16, 1) per-patch logits


class HiFiC(CodecModel):
    """Full generative codec with a mean-scale hyperprior entropy model.
    The discriminator is a separate module (train.gan wires it up)."""

    N: int = 220  # hyper width
    M: int = 220  # latent channels
    entropy_structure = "mean_scale"

    def setup(self):
        self.encoder = HiFiCEncoder(bottleneck=self.M)
        self.generator = HiFiCGenerator()

        self.h_a_0 = Conv(self.N, kernel_size=3, stride=1)
        self.h_a_2 = Conv(self.N, kernel_size=5, stride=2)
        self.h_a_4 = Conv(self.N, kernel_size=5, stride=2)

        self.h_s_0 = Deconv(self.N)
        self.h_s_2 = Deconv(self.N * 3 // 2)
        self.h_s_4 = Conv(self.N * 2, kernel_size=3, stride=1)

        self.entropy_bottleneck = EntropyBottleneck(self.N)

    def g_a(self, x):
        return self.encoder(x)

    def g_s(self, y):
        return self.generator(y)

    def h_a(self, y):
        h = nn.leaky_relu(self.h_a_0(y))
        h = nn.leaky_relu(self.h_a_2(h))
        return self.h_a_4(h)

    def h_s(self, z):
        h = nn.leaky_relu(self.h_s_0(z))
        h = nn.leaky_relu(self.h_s_2(h))
        return self.h_s_4(h)

    def __call__(self, x, quant_mode: str = "noise") -> Dict[str, Any]:
        y = self.g_a(x)
        z = self.h_a(y)
        rng = _maybe_rng(self, quant_mode)
        z_hat, z_lik = self.entropy_bottleneck(z, quant_mode=quant_mode, key=rng)
        gaussian_params = self.h_s(z_hat)
        scales, means = jnp.split(gaussian_params, 2, axis=-1)
        rng_y = _maybe_rng(self, quant_mode)
        y_hat, y_lik = gaussian_conditional(
            y, scales, means=means, quant_mode=quant_mode, key=rng_y
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
