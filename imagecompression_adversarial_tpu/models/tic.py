"""TIC-family transformer codec: window-attention analysis/synthesis.

The reference ports its attack to TIC, a Swin-style transformer codec
(`/root/reference/attack_TIC.py:45-46` imports the external
``models.tic_v1.TIC``; the attack there needs a window-size-aware
``g_a(im, x_size)``, `attack_TIC.py:190-196`).  This module provides an
in-framework transformer codec with the same shape: strided-conv patch
embeddings interleaved with (shifted-)window multi-head self-attention
blocks for g_a, the mirror with transposed convs for g_s, and a mean-scale
hyperprior.

TPU notes: window partition is a pure reshape/transpose; attention over
(windows, tokens, C) batches straight onto the MXU; window size 4 keeps
every scale of pad-to-64 inputs evenly partitioned with static shapes.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy.factorized import EntropyBottleneck
from ..entropy.gaussian import gaussian_conditional
from .codecs import CodecModel, _maybe_rng
from .layers import Conv, Deconv


def window_partition(x: jax.Array, w: int) -> jax.Array:
    """(B, H, W, C) -> (B*nH*nW, w*w, C)."""
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def window_merge(x: jax.Array, w: int, b: int, h: int, ww: int) -> jax.Array:
    c = x.shape[-1]
    x = x.reshape(b, h // w, ww // w, w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, ww, c)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int

    @nn.compact
    def __call__(self, x):  # (nW, T, C)
        t = x.shape[1]
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(a):
            return a.reshape(a.shape[0], t, self.num_heads, head_dim).transpose(
                0, 2, 1, 3
            )

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("whtd,whsd->whts", q, k) / jnp.sqrt(head_dim).astype(
            x.dtype
        )
        # learned relative position bias over the window lattice
        rel = self.param(
            "rel_bias",
            nn.initializers.zeros,
            (self.num_heads, self.window * 2 - 1, self.window * 2 - 1),
        )
        idx = jnp.arange(self.window)
        dy = idx[:, None] - idx[None, :] + self.window - 1  # (w, w)
        # token (i, j) x (i', j') bias: rel[h, dy(i,i'), dx(j,j')]
        bias = rel[:, dy[:, None, :, None], dy[None, :, None, :]]
        bias = bias.reshape(self.num_heads, t, t)
        attn = jax.nn.softmax(attn + bias[None], axis=-1)
        out = jnp.einsum("whts,whsd->whtd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], t, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int = 4
    shift: bool = False
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x):  # NHWC
        b, h, w, c = x.shape
        win = self.window
        shortcut = x
        y = nn.LayerNorm(name="norm1")(x)
        if self.shift:
            y = jnp.roll(y, (-win // 2, -win // 2), axis=(1, 2))
        y = window_partition(y, win)
        y = WindowAttention(self.dim, self.num_heads, win, name="attn")(y)
        y = window_merge(y, win, b, h, w)
        if self.shift:
            y = jnp.roll(y, (win // 2, win // 2), axis=(1, 2))
        x = shortcut + y

        z = nn.LayerNorm(name="norm2")(x)
        z = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp1")(z)
        z = nn.gelu(z)
        z = nn.Dense(self.dim, name="mlp2")(z)
        return x + z


class TIC(CodecModel):
    """Transformer image codec: 4 conv-downsample stages with paired
    (plain, shifted) window-attention blocks; mirrored synthesis."""

    N: int = 128
    M: int = 192
    entropy_structure = "mean_scale"
    window: int = 4
    heads: Tuple[int, ...] = (4, 8, 8, 8)

    def setup(self):
        dims = (self.N, self.N, self.N, self.M)
        self.embed = [
            Conv(d, kernel_size=3, stride=2, name=f"embed_{i}")
            for i, d in enumerate(dims)
        ]
        self.enc_blocks = [
            (
                SwinBlock(d, self.heads[i], self.window, False,
                          name=f"enc_{i}_0"),
                SwinBlock(d, self.heads[i], self.window, True,
                          name=f"enc_{i}_1"),
            )
            for i, d in enumerate(dims)
        ]
        rdims = (self.N, self.N, self.N, 3)
        self.dec_blocks = [
            (
                SwinBlock(dims[3 - i], self.heads[3 - i], self.window, False,
                          name=f"dec_{i}_0"),
                SwinBlock(dims[3 - i], self.heads[3 - i], self.window, True,
                          name=f"dec_{i}_1"),
            )
            for i in range(4)
        ]
        self.unembed = [
            Deconv(rdims[i], kernel_size=3, stride=2, name=f"unembed_{i}")
            for i in range(4)
        ]

        self.h_a_0 = Conv(self.N, kernel_size=3, stride=1)
        self.h_a_2 = Conv(self.N, kernel_size=5, stride=2)
        self.h_a_4 = Conv(self.N, kernel_size=5, stride=2)
        self.h_s_0 = Deconv(self.M)
        self.h_s_2 = Deconv(self.M * 3 // 2)
        self.h_s_4 = Conv(self.M * 2, kernel_size=3, stride=1)
        self.entropy_bottleneck = EntropyBottleneck(self.N)

    def g_a(self, x):
        for emb, (blk0, blk1) in zip(self.embed, self.enc_blocks):
            x = emb(x)
            x = blk0(x)
            x = blk1(x)
        return x

    def g_s(self, y):
        for (blk0, blk1), unemb in zip(self.dec_blocks, self.unembed):
            y = blk0(y)
            y = blk1(y)
            y = unemb(y)
        return y

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
