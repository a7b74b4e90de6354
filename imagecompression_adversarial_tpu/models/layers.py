"""Codec building-block layers (flax.linen, NHWC).

TPU-first re-implementations of the layers the reference pulls from
CompressAI (`/root/reference/anchors/model.py:3-5`: ``GDN``,
``MaskedConv2d``, and the ``conv``/``deconv`` builders at
`/root/reference/anchors/utils.py:112-130`).

Conventions
-----------
* Activations are NHWC (TPU-preferred); kernels are HWIO.
* ``Conv``/``Deconv`` use explicit padding that reproduces PyTorch's
  ``padding=k//2`` (+ ``output_padding=stride-1`` for transposed convs), so a
  converted CompressAI checkpoint is numerically identical.  ``Deconv`` is
  expressed as an input-dilated convolution with a spatially flipped kernel —
  the exact linear map of ``nn.ConvTranspose2d`` — which XLA lowers straight
  onto the MXU.
* GDN keeps CompressAI's non-negative reparametrization (sqrt + pedestal
  2^-36, cf. reference `utils/ops.py:58-97`) and is evaluated as one channel
  matmul + rsqrt; with C in {128..320} the matmul rides the MXU.
"""

from __future__ import annotations

import math
import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.bounds import lower_bound


def _torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch Conv2d default init: kaiming_uniform(a=sqrt(5)).

    shape is HWIO; fan_in = kh*kw*in_ch.
    """
    kh, kw, in_ch, _ = shape
    fan_in = kh * kw * in_ch
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(fan_in):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv(nn.Module):
    """Strided conv with PyTorch-style symmetric padding k//2."""

    features: int
    kernel_size: int = 5
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", _torch_conv_kernel_init, (k, k, in_ch, self.features)
        )
        bias = self.param("bias", _torch_bias_init(k * k * in_ch), (self.features,))
        pad = k // 2
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            (self.stride, self.stride),
            ((pad, pad), (pad, pad)),
            dimension_numbers=dn,
        )
        return y + bias.astype(x.dtype)


class Deconv(nn.Module):
    """Transposed conv == PyTorch ConvTranspose2d(k, s, padding=k//2,
    output_padding=s-1): input dilation s, flipped kernel, asymmetric pad.

    ``subpel`` selects an exactly-equivalent subpixel evaluation: one
    stride-1 conv emitting ``s*s*features`` channels at INPUT resolution
    followed by depth-to-space (same "kernel" parameter, taps regrouped by
    output phase at apply time — checkpoints are unaffected).  Motivation:
    XLA's conv-transpose backward materializes the full-resolution cotangent
    in a channel-padded layout; for the final 3-channel synthesis deconv
    that padding is ~21x (3.02 GB at 12.6 MP — the round-2 OOM margin,
    RESULTS.md "Megapixel attack envelope").  The subpixel form keeps every
    conv buffer at half resolution with 4x channels (12 for the final
    stage), shrinking the padded waste by ~4x and removing the full-res
    tensor from the conv backward entirely.  ``subpel=None`` defers to the
    ``ICAT_SUBPEL_DECONV`` env var: '' /'0' = never, 'final' = only narrow
    (<=4-channel) outputs, 'all' = every stride-2 k5 deconv.
    """

    features: int
    kernel_size: int = 5
    stride: int = 2
    subpel: bool | None = None

    def _use_subpel(self) -> bool:
        if self.kernel_size != 5 or self.stride != 2:
            return False
        if self.subpel is not None:
            return self.subpel
        import os

        mode = os.environ.get("ICAT_SUBPEL_DECONV", "")
        if mode == "all":
            return True
        if mode == "final":
            return self.features <= 4
        return False

    @nn.compact
    def __call__(self, x, phase_output: bool = False):
        k = self.kernel_size
        s = self.stride
        in_ch = x.shape[-1]
        # Kernel stored as (kh, kw, in, out) = torch weight (in, out, kh, kw)
        # transposed to HWIO; fan_in for torch's transposed-conv init is
        # kh*kw*out? torch uses weight.size(1) * k * k = out_ch * k * k.
        kernel = self.param(
            "kernel",
            lambda key, shape: _torch_conv_kernel_init(key, shape),
            (k, k, in_ch, self.features),
        )
        bias = self.param("bias", _torch_bias_init(k * k * self.features), (self.features,))
        if phase_output:
            if k != 5 or s != 2:
                raise ValueError(
                    "Deconv phase_output requires kernel_size=5/stride=2 (the "
                    f"subpel phase decomposition); got k={k}, s={s}"
                )
            # phase-space output: the subpixel conv WITHOUT depth-to-space,
            # (n, h, w, s*s*features) with phase-major channels — the
            # depth_to_space() of this tensor is exactly __call__'s output.
            # Consumers that only need permutation-invariant reductions
            # (MSE) can stay in this space and never materialize the
            # full-resolution narrow tensor (whose transpose/backward pads
            # catastrophically on TPU: 64x measured at 12.6 MP).
            return self._subpel_forward(x, kernel, bias, d2s=False)
        if self._use_subpel():
            return self._subpel_forward(x, kernel, bias)
        pad = k // 2
        out_pad = s - 1
        # ConvTranspose = dilate input by s, pad by (k-1-pad) each side plus
        # output_padding on the high side, correlate with flipped kernel.
        lo = k - 1 - pad
        hi = k - 1 - pad + out_pad
        flipped = jnp.flip(kernel, axis=(0, 1)).astype(x.dtype)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, flipped.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            x,
            flipped,
            window_strides=(1, 1),
            padding=((lo, hi), (lo, hi)),
            lhs_dilation=(s, s),
            dimension_numbers=dn,
        )
        return y + bias.astype(x.dtype)

    def _subpel_forward(self, x, kernel, bias, d2s: bool = True):
        """Exact phase decomposition of ConvTranspose2d(5, 2, 2, out_pad=1).

        Output pixel o = 2i + k - 2 (torch tap index k in 0..4), so the even
        output phase collects taps {4, 2, 0} of a 3-tap stride-1 conv over
        the input and the odd phase taps {-, 3, 1}; rows and columns factor
        independently.  One (3, 3, in, 4*out) conv + depth-to-space — no
        input dilation, no full-resolution conv buffers.
        """
        f = self.features

        row0 = kernel[jnp.array([4, 2, 0])]  # (3, 5, in, out): even phase
        row1 = jnp.concatenate(
            [jnp.zeros_like(kernel[0:1]), kernel[jnp.array([3, 1])]], axis=0
        )  # odd phase

        def cols(kr, b):
            if b == 0:
                return kr[:, jnp.array([4, 2, 0])]
            return jnp.concatenate(
                [jnp.zeros_like(kr[:, 0:1]), kr[:, jnp.array([3, 1])]], axis=1
            )

        w = jnp.concatenate(
            [cols(row0 if a == 0 else row1, b) for a in (0, 1) for b in (0, 1)],
            axis=-1,
        ).astype(x.dtype)  # (3, 3, in, 4*out), phase-major channel order
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
        )
        if not d2s:
            # phase-space output in NCHW: the channel dim (4*out, e.g. 12)
            # is small and would layout-pad 10.7x as the minor dim of an
            # NHWC conv output (measured at 12.6 MP); as a major dim over
            # (H, W) minor tiles it pads nothing.
            dn = jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NHWC", "HWIO", "NCHW")
            )
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
            )  # (n, 4*out, h, w)
            return y + jnp.tile(bias, 4).astype(x.dtype)[None, :, None, None]
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
        )  # (n, h, w, 4*out)
        n, hm, wm, _ = y.shape
        y = y.reshape(n, hm, wm, 2, 2, f)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * hm, 2 * wm, f)
        return y + bias.astype(x.dtype)


def depth_to_space(y: jax.Array, block: int = 2) -> jax.Array:
    """(n, h, w, block^2 * f) phase-major -> (n, block*h, block*w, f);
    inverse of :func:`space_to_depth` and the tail of Deconv's subpixel
    form (channel order (a, b, f): out[2m+a, 2n+b, f] = y[m, n, (2a+b)f+f])."""
    n, h, w, c = y.shape
    f = c // (block * block)
    y = y.reshape(n, h, w, block, block, f)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, block * h, block * w, f)


def space_to_depth(x: jax.Array, block: int = 2) -> jax.Array:
    """(n, H, W, f) -> (n, H/block, W/block, block^2 * f) phase-major."""
    n, hh, ww, f = x.shape
    h, w = hh // block, ww // block
    x = x.reshape(n, h, block, w, block, f)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, block * block * f)


class GDN(nn.Module):
    """Generalized divisive normalization: x / sqrt(beta + gamma @ x^2).

    ``inverse=True`` gives IGDN (multiply by sqrt).  Parameters are stored in
    CompressAI's reparametrized space (sqrt with pedestal), so converted
    checkpoints drop straight in.
    """

    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    reparam_offset: float = 2 ** -18

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        pedestal = self.reparam_offset ** 2
        beta_bound = (self.beta_min + pedestal) ** 0.5
        gamma_bound = self.reparam_offset

        beta_r = self.param(
            "beta",
            lambda key, shape: jnp.sqrt(jnp.ones(shape, jnp.float32) + pedestal),
            (c,),
        )
        gamma_r = self.param(
            "gamma",
            lambda key, shape: jnp.sqrt(
                self.gamma_init * jnp.eye(c, dtype=jnp.float32) + pedestal
            ),
            (c, c),
        )

        beta = lower_bound(beta_r, beta_bound) ** 2 - pedestal
        gamma = lower_bound(gamma_r, gamma_bound) ** 2 - pedestal

        # norm[..., o] = sum_i gamma[o, i] * x[..., i]^2 + beta[o].
        # Shipped as the plain einsum: XLA's own fusion beat the hand Pallas
        # kernel end-to-end in BOTH measured rounds (1.1 vs 1.9 ms micro,
        # round 1; 138 vs 101.6 attack steps/s, round 2 — RESULTS.md), so the
        # kernel was demoted to a benchmark harness (scripts/pallas_gdn.py).
        norm = jnp.einsum("...i,oi->...o", (x * x), gamma.astype(x.dtype)) + beta.astype(
            x.dtype
        )
        if self.inverse:
            return x * jnp.sqrt(norm)
        return x * jax.lax.rsqrt(norm)


class LinearGDN(nn.Module):
    """Computationally-efficient GDN variant (Johnston et al.): divisive
    normalization by a LINEAR pool of |x| instead of a sqrt pool of x^2
    (ref `utils/ops.py:99-118`).  Same reparametrized parameter space as
    GDN, so profiles/converters treat them identically."""

    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    reparam_offset: float = 2 ** -18

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        pedestal = self.reparam_offset ** 2
        beta_bound = (self.beta_min + pedestal) ** 0.5
        gamma_bound = self.reparam_offset

        beta_r = self.param(
            "beta",
            lambda key, shape: jnp.sqrt(jnp.ones(shape, jnp.float32) + pedestal),
            (c,),
        )
        gamma_r = self.param(
            "gamma",
            lambda key, shape: jnp.sqrt(
                self.gamma_init * jnp.eye(c, dtype=jnp.float32) + pedestal
            ),
            (c, c),
        )
        # reference linear_GDN keeps the clamped reparametrized values
        # directly (no square/pedestal removal), ref `utils/ops.py:104-109`
        beta = lower_bound(beta_r, beta_bound)
        gamma = lower_bound(gamma_r, gamma_bound)

        norm = jnp.einsum(
            "...i,oi->...o", jnp.abs(x), gamma.astype(x.dtype)
        ) + beta.astype(x.dtype)
        if self.inverse:
            return x * norm
        return x / norm


class MaskedConv(nn.Module):
    """Type-A masked 5x5 conv (autoregressive context prediction).

    Training/estimation path only needs the masked convolution itself (one
    parallel conv); sequential decode-order inference lives in the real-coder
    path (SURVEY §7.3).  Ref usage: ``net.context_prediction``
    (`/root/reference/anchors/model.py:103`).
    """

    features: int
    kernel_size: int = 5

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", _torch_conv_kernel_init, (k, k, in_ch, self.features)
        )
        bias = self.param("bias", _torch_bias_init(k * k * in_ch), (self.features,))
        # Mask A: zero the center pixel and everything after it in raster order.
        mask = jnp.ones((k, k, 1, 1), x.dtype)
        mask = mask.at[k // 2, k // 2 :, :, :].set(0.0)
        mask = mask.at[k // 2 + 1 :, :, :, :].set(0.0)
        pad = k // 2
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype) * mask,
            (1, 1),
            ((pad, pad), (pad, pad)),
            dimension_numbers=dn,
        )
        return y + bias.astype(x.dtype)


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """PyTorch-compatible pixel shuffle, NHWC.

    out[b, h*r+i, w*r+j, c] = in[b, h, w, c*r*r + i*r + j]
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, c
    return x.reshape(b, h * r, w * r, c)


class SubpelConv(nn.Module):
    """3x3 conv to C*r^2 channels followed by pixel shuffle (cheng2020)."""

    features: int
    upscale: int = 2
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, phase_output: bool = False):
        r = self.upscale
        # named "conv" so the checkpoint converter's `subpel_conv.0.weight`
        # -> `subpel_conv/conv/kernel` mapping lands (io/convert.py)
        y = Conv(
            self.features * r * r, kernel_size=self.kernel_size, stride=1,
            name="conv",
        )(x)
        if phase_output:
            # phase space, NCHW: pixel_shuffle(transpose(out, NHWC), r) ==
            # __call__'s output; channel-major so the (e.g. 12-wide)
            # phase dim never layout-pads on TPU (cf. Deconv.phase_output)
            return jnp.transpose(y, (0, 3, 1, 2))
        return pixel_shuffle(y, r)


class ResidualBlock(nn.Module):
    """conv3x3 -> lrelu -> conv3x3 -> lrelu, additive skip (cheng2020)."""

    features: int

    @nn.compact
    def __call__(self, x):
        identity = x
        y = Conv(self.features, kernel_size=3, stride=1, name="conv1")(x)
        y = nn.leaky_relu(y)
        y = Conv(self.features, kernel_size=3, stride=1, name="conv2")(y)
        y = nn.leaky_relu(y)
        if x.shape[-1] != self.features:
            identity = Conv(self.features, kernel_size=1, stride=1, name="skip")(x)
        return y + identity


class ResidualBlockWithStride(nn.Module):
    """conv3x3/s -> lrelu -> conv3x3 -> GDN, strided-1x1 skip (cheng2020)."""

    features: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        y = Conv(self.features, kernel_size=3, stride=self.stride, name="conv1")(x)
        y = nn.leaky_relu(y)
        y = Conv(self.features, kernel_size=3, stride=1, name="conv2")(y)
        y = GDN(name="gdn")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = Conv(
                self.features, kernel_size=1, stride=self.stride, name="skip"
            )(x)
        else:
            identity = x
        return y + identity


class ResidualUnit(nn.Module):
    """Half-width bottleneck residual unit (cheng2020 attention branch)."""

    features: int

    @nn.compact
    def __call__(self, x):
        half = self.features // 2
        y = Conv(half, kernel_size=1, stride=1, name="conv1")(x)
        y = nn.relu(y)
        y = Conv(half, kernel_size=3, stride=1, name="conv2")(y)
        y = nn.relu(y)
        y = Conv(self.features, kernel_size=1, stride=1, name="conv3")(y)
        return nn.relu(x + y)


class AttentionBlock(nn.Module):
    """cheng2020 attention block: trunk of 3 residual units gated by a
    sigmoid mask branch (3 units + 1x1 conv)."""

    features: int

    @nn.compact
    def __call__(self, x):
        trunk = x
        for i in range(3):
            trunk = ResidualUnit(self.features, name=f"trunk_{i}")(trunk)
        mask = x
        for i in range(3):
            mask = ResidualUnit(self.features, name=f"mask_{i}")(mask)
        mask = Conv(self.features, kernel_size=1, stride=1, name="mask_conv")(mask)
        return x + trunk * jax.nn.sigmoid(mask)


class ResidualBlockUpsample(nn.Module):
    """subpel -> lrelu -> conv3x3 -> IGDN, subpel skip (cheng2020)."""

    features: int
    upscale: int = 2

    @nn.compact
    def __call__(self, x):
        y = SubpelConv(self.features, upscale=self.upscale, name="subpel_conv")(x)
        y = nn.leaky_relu(y)
        y = Conv(self.features, kernel_size=3, stride=1, name="conv")(y)
        y = GDN(inverse=True, name="igdn")(y)
        identity = SubpelConv(self.features, upscale=self.upscale, name="upsample")(x)
        return y + identity
