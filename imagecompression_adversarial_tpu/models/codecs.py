"""Codec model families (flax.linen, NHWC).

Re-designs of the architectures the reference reaches through the CompressAI
zoo (`/root/reference/anchors/model.py:60-78`):

  ``FactorizedPrior``   bmshj2018_factorized
  ``ScaleHyperprior``   bmshj2018_hyperprior
  ``JointAutoregressive`` mbt2018 ("context")
  ``Cheng2020Anchor``   cheng2020_anchor
  ``DebugCodec``        the reference's tiny `ae_onelayer` fixture
                        (`anchors/model.py:9-35`)

Design notes (TPU-first):
* Quantization behaviour is an explicit ``quant_mode`` static argument
  ('noise' | 'dequantize' | 'ste' | 'none') instead of train()/eval() module
  state (SURVEY §7.1).  ``quant_mode='none'`` is the attack's
  quantization-free ``g_s(g_a(x))`` path (ref `attack_rd.py:344-349`).
* Submodule names carry the torch Sequential index (``g_a_0`` == torch
  ``g_a.0``) so the PyTorch->JAX checkpoint converter is a pure renaming +
  layout transpose.
* All forwards are pure functions of (params, x, rng) with static shapes —
  jit/vmap/pjit compose freely; the autoregressive context model uses its
  parallel masked-conv estimation form (decode-order inference is part of
  the real-coder milestone, SURVEY §7.3).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..entropy.factorized import EntropyBottleneck
from ..entropy.gaussian import gaussian_conditional
from ..ops.quant import quantize
from .layers import (
    AttentionBlock,
    Conv,
    Deconv,
    GDN,
    MaskedConv,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    SubpelConv,
)

Result = Dict[str, Any]


def _maybe_rng(module: nn.Module, quant_mode: str) -> Optional[jax.Array]:
    if quant_mode == "noise":
        return module.make_rng("quant")
    return None


class CodecModel(nn.Module):
    """Common interface: g_a / g_s / h_a / h_s methods + __call__ forward.

    ``entropy_structure`` tells the real-coder path (entropy/codec.py) how
    symbols are conditioned: 'factorized' | 'scale_hyper' | 'mean_scale' |
    'context' | 'context_gmm' | 'none'.
    """

    entropy_structure = "none"
    # True iff this family's `g_s_phase` computes EXACTLY g_s up to the
    # depth-to-space permutation — gates the attack's phase-space loss
    # (attacks/rd.py).  Subclasses whose g_s is not the plain
    # g_s_0..g_s_5 + final-deconv chain must keep this False unless they
    # override g_s_phase to match their own synthesis.
    supports_phase_synthesis = False
    # which key of the forward-result dict holds the latent g_s actually
    # decodes (fic synthesizes the UN-quantized y, models/fic.py:200)
    phase_reference_latent = "y_hat"

    def encode(self, x):  # alias used by analysis tools
        return self.g_a(x)

    def decode(self, y):
        return self.g_s(y)

    def g_s_phase(self, y):
        """Synthesis ending in PHASE SPACE: (n, 12, H/2, W/2) NCHW with the
        final deconv in its subpixel form, no depth-to-space.
        ``depth_to_space(transpose(g_s_phase(y), NHWC)) == g_s(y)`` exactly.
        NCHW because a 12-channel minor dim would layout-pad 10.7x on TPU;
        as a major dim over an (H, W) minor tile it pads nothing.

        Rationale (TPU layout): the full-resolution 3-channel output tensor
        is laid out channel-padded by XLA in conv backwards (21x at
        12.6 MP — the round-2 OOM margin), and a subpixel+depth-to-space
        forward merely moves the pad to the transpose copy (64x, measured).
        MSE-style losses are invariant under the depth-to-space permutation,
        so the attack loss can consume this tensor directly and the hot
        loop never materializes a full-res narrow tensor at all
        (attacks/rd.py ``phase_space_loss``).

        Available on the Sequential families whose synthesis ends in
        ``Deconv(3)`` (factorized / hyper / context / fic).
        """
        for layer in (self.g_s_0, self.g_s_1, self.g_s_2, self.g_s_3,
                      self.g_s_4, self.g_s_5):
            y = layer(y)
        return self.g_s_6(y, phase_output=True)

    def from_latent(self, y, quant_mode: str = "noise") -> Result:
        """Run the codec forward from a given latent ``y`` (everything after
        g_a).  This is the hook the latent-clamp defenses use: clamp
        ``g_a(x)`` outside, then re-enter here — the JAX analog of the
        reference's y_main-rewrite pattern (ref `attack_ifgsm.py:186-210`,
        `attack_rd.py:220-228`)."""
        raise NotImplementedError


class FactorizedPrior(CodecModel):
    """bmshj2018-factorized: 4x (conv5x5/2 + GDN) analysis, mirrored synthesis,
    fully-factorized entropy model on y."""

    N: int
    M: int
    entropy_structure = "factorized"
    supports_phase_synthesis = True

    def setup(self):
        self.g_a_0 = Conv(self.N)
        self.g_a_1 = GDN()
        self.g_a_2 = Conv(self.N)
        self.g_a_3 = GDN()
        self.g_a_4 = Conv(self.N)
        self.g_a_5 = GDN()
        self.g_a_6 = Conv(self.M)

        self.g_s_0 = Deconv(self.N)
        self.g_s_1 = GDN(inverse=True)
        self.g_s_2 = Deconv(self.N)
        self.g_s_3 = GDN(inverse=True)
        self.g_s_4 = Deconv(self.N)
        self.g_s_5 = GDN(inverse=True)
        self.g_s_6 = Deconv(3)

        self.entropy_bottleneck = EntropyBottleneck(self.M)

    def g_a(self, x):
        for layer in (self.g_a_0, self.g_a_1, self.g_a_2, self.g_a_3,
                      self.g_a_4, self.g_a_5, self.g_a_6):
            x = layer(x)
        return x

    def g_s(self, y):
        for layer in (self.g_s_0, self.g_s_1, self.g_s_2, self.g_s_3,
                      self.g_s_4, self.g_s_5, self.g_s_6):
            y = layer(y)
        return y

    def __call__(self, x, quant_mode: str = "noise") -> Result:
        return self.from_latent(self.g_a(x), quant_mode)

    def from_latent(self, y, quant_mode: str = "noise") -> Result:
        # named for the remat policy save_only_these_names: saving only the
        # 16x-downsampled latents keeps the backward's recompute local
        # (attacks/common.py remat_policy='latents')
        y = checkpoint_name(y, "latent")
        y_hat, y_lik = self.entropy_bottleneck(
            y, quant_mode=quant_mode, key=_maybe_rng(self, quant_mode)
        )
        y_hat = checkpoint_name(y_hat, "latent_hat")
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "y": y,
            "y_hat": y_hat,
            "likelihoods": {"y": y_lik},
        }

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class ScaleHyperprior(CodecModel):
    """bmshj2018-hyperprior: factorized backbone + scale-only hyper network;
    z = h_a(|y|), scales = h_s(z_hat) (ref `anchors/model.py:91-95`)."""

    N: int
    M: int
    entropy_structure = "scale_hyper"
    supports_phase_synthesis = True

    def setup(self):
        self.g_a_0 = Conv(self.N)
        self.g_a_1 = GDN()
        self.g_a_2 = Conv(self.N)
        self.g_a_3 = GDN()
        self.g_a_4 = Conv(self.N)
        self.g_a_5 = GDN()
        self.g_a_6 = Conv(self.M)

        self.g_s_0 = Deconv(self.N)
        self.g_s_1 = GDN(inverse=True)
        self.g_s_2 = Deconv(self.N)
        self.g_s_3 = GDN(inverse=True)
        self.g_s_4 = Deconv(self.N)
        self.g_s_5 = GDN(inverse=True)
        self.g_s_6 = Deconv(3)

        self.h_a_0 = Conv(self.N, kernel_size=3, stride=1)
        self.h_a_2 = Conv(self.N)
        self.h_a_4 = Conv(self.N)

        self.h_s_0 = Deconv(self.N)
        self.h_s_2 = Deconv(self.N)
        self.h_s_4 = Conv(self.M, kernel_size=3, stride=1)

        self.entropy_bottleneck = EntropyBottleneck(self.N)

    def g_a(self, x):
        for layer in (self.g_a_0, self.g_a_1, self.g_a_2, self.g_a_3,
                      self.g_a_4, self.g_a_5, self.g_a_6):
            x = layer(x)
        return x

    def g_s(self, y):
        for layer in (self.g_s_0, self.g_s_1, self.g_s_2, self.g_s_3,
                      self.g_s_4, self.g_s_5, self.g_s_6):
            y = layer(y)
        return y

    def h_a(self, y):
        h = nn.relu(self.h_a_0(y))
        h = nn.relu(self.h_a_2(h))
        return self.h_a_4(h)

    def h_s(self, z):
        h = nn.relu(self.h_s_0(z))
        h = nn.relu(self.h_s_2(h))
        return nn.relu(self.h_s_4(h))

    def __call__(self, x, quant_mode: str = "noise") -> Result:
        return self.from_latent(self.g_a(x), quant_mode)

    def from_latent(self, y, quant_mode: str = "noise") -> Result:
        y = checkpoint_name(y, "latent")
        z = self.h_a(jnp.abs(y))
        rng = _maybe_rng(self, quant_mode)
        z_hat, z_lik = self.entropy_bottleneck(z, quant_mode=quant_mode, key=rng)
        scales = checkpoint_name(self.h_s(z_hat), "hyper_out")
        rng2 = _maybe_rng(self, quant_mode)
        y_hat, y_lik = gaussian_conditional(
            y, scales, quant_mode=quant_mode, key=rng2
        )
        y_hat = checkpoint_name(y_hat, "latent_hat")
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "y": y,
            "y_hat": y_hat,
            "z_hat": z_hat,
            "scales_hat": scales,
            "likelihoods": {"y": y_lik, "z": z_lik},
        }

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class JointAutoregressive(CodecModel):
    """mbt2018 ("context"): mean-scale hyperprior + masked-conv context model
    (parallel estimation path, ref `anchors/model.py:97-106`)."""

    N: int
    M: int
    entropy_structure = "context"
    supports_phase_synthesis = True

    def setup(self):
        self.g_a_0 = Conv(self.N)
        self.g_a_1 = GDN()
        self.g_a_2 = Conv(self.N)
        self.g_a_3 = GDN()
        self.g_a_4 = Conv(self.N)
        self.g_a_5 = GDN()
        self.g_a_6 = Conv(self.M)

        self.g_s_0 = Deconv(self.N)
        self.g_s_1 = GDN(inverse=True)
        self.g_s_2 = Deconv(self.N)
        self.g_s_3 = GDN(inverse=True)
        self.g_s_4 = Deconv(self.N)
        self.g_s_5 = GDN(inverse=True)
        self.g_s_6 = Deconv(3)

        self.h_a_0 = Conv(self.N, kernel_size=3, stride=1)
        self.h_a_2 = Conv(self.N)
        self.h_a_4 = Conv(self.N)

        self.h_s_0 = Deconv(self.M)
        self.h_s_2 = Deconv(self.M * 3 // 2)
        self.h_s_4 = Conv(self.M * 2, kernel_size=3, stride=1)

        self.context_prediction = MaskedConv(2 * self.M)
        self.entropy_parameters_0 = Conv(self.M * 10 // 3, kernel_size=1, stride=1)
        self.entropy_parameters_2 = Conv(self.M * 8 // 3, kernel_size=1, stride=1)
        self.entropy_parameters_4 = Conv(self.M * 6 // 3, kernel_size=1, stride=1)

        self.entropy_bottleneck = EntropyBottleneck(self.N)

    def g_a(self, x):
        for layer in (self.g_a_0, self.g_a_1, self.g_a_2, self.g_a_3,
                      self.g_a_4, self.g_a_5, self.g_a_6):
            x = layer(x)
        return x

    def g_s(self, y):
        for layer in (self.g_s_0, self.g_s_1, self.g_s_2, self.g_s_3,
                      self.g_s_4, self.g_s_5, self.g_s_6):
            y = layer(y)
        return y

    def h_a(self, y):
        h = nn.leaky_relu(self.h_a_0(y))
        h = nn.leaky_relu(self.h_a_2(h))
        return self.h_a_4(h)

    def h_s(self, z):
        h = nn.leaky_relu(self.h_s_0(z))
        h = nn.leaky_relu(self.h_s_2(h))
        return self.h_s_4(h)

    def entropy_parameters(self, v):
        v = nn.leaky_relu(self.entropy_parameters_0(v))
        v = nn.leaky_relu(self.entropy_parameters_2(v))
        return self.entropy_parameters_4(v)

    def __call__(self, x, quant_mode: str = "noise") -> Result:
        return self.from_latent(self.g_a(x), quant_mode)

    def from_latent(self, y, quant_mode: str = "noise") -> Result:
        y = checkpoint_name(y, "latent")
        z = self.h_a(y)
        rng = _maybe_rng(self, quant_mode)
        z_hat, z_lik = self.entropy_bottleneck(z, quant_mode=quant_mode, key=rng)
        params = checkpoint_name(self.h_s(z_hat), "hyper_out")

        # The synthesis path uses means-free quantization of y (ref
        # `anchors/model.py:102`: GaussianConditional.quantize without means).
        rng_y = _maybe_rng(self, quant_mode)
        y_hat = quantize(y, "dequantize" if quant_mode in ("dequantize", "ste") else quant_mode,
                         means=None, key=rng_y)
        y_hat = checkpoint_name(y_hat, "latent_hat")
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


class Cheng2020Anchor(JointAutoregressive):
    """cheng2020-anchor: residual-block transforms over the joint
    autoregressive entropy structure (M == N)."""

    N: int
    M: int  # always == N
    ep_final_width: Optional[int] = None  # GMM variant widens the head
    supports_phase_synthesis = True  # via the final SubpelConv's phase form

    def setup(self):
        n = self.N
        self.g_a_0 = ResidualBlockWithStride(n, stride=2)
        self.g_a_1 = ResidualBlock(n)
        self.g_a_2 = ResidualBlockWithStride(n, stride=2)
        self.g_a_3 = ResidualBlock(n)
        self.g_a_4 = ResidualBlockWithStride(n, stride=2)
        self.g_a_5 = ResidualBlock(n)
        self.g_a_6 = Conv(n, kernel_size=3, stride=2)

        self.h_a_0 = Conv(n, kernel_size=3, stride=1)
        self.h_a_2 = Conv(n, kernel_size=3, stride=1)
        self.h_a_4 = Conv(n, kernel_size=3, stride=2)
        self.h_a_6 = Conv(n, kernel_size=3, stride=1)
        self.h_a_8 = Conv(n, kernel_size=3, stride=2)

        self.h_s_0 = Conv(n, kernel_size=3, stride=1)
        self.h_s_2 = SubpelConv(n, upscale=2)
        self.h_s_4 = Conv(n * 3 // 2, kernel_size=3, stride=1)
        self.h_s_6 = SubpelConv(n * 3 // 2, upscale=2)
        self.h_s_8 = Conv(n * 2, kernel_size=3, stride=1)

        self.g_s_0 = ResidualBlock(n)
        self.g_s_1 = ResidualBlockUpsample(n, upscale=2)
        self.g_s_2 = ResidualBlock(n)
        self.g_s_3 = ResidualBlockUpsample(n, upscale=2)
        self.g_s_4 = ResidualBlock(n)
        self.g_s_5 = ResidualBlockUpsample(n, upscale=2)
        self.g_s_6 = ResidualBlock(n)
        self.g_s_7 = SubpelConv(3, upscale=2)

        self.context_prediction = MaskedConv(2 * n)
        self.entropy_parameters_0 = Conv(n * 10 // 3, kernel_size=1, stride=1)
        self.entropy_parameters_2 = Conv(n * 8 // 3, kernel_size=1, stride=1)
        self.entropy_parameters_4 = Conv(
            self.ep_final_width or (n * 6 // 3), kernel_size=1, stride=1
        )

        self.entropy_bottleneck = EntropyBottleneck(n)

    def g_a(self, x):
        for layer in (self.g_a_0, self.g_a_1, self.g_a_2, self.g_a_3,
                      self.g_a_4, self.g_a_5, self.g_a_6):
            x = layer(x)
        return x

    def _g_s_body(self, y):
        """Everything up to (not including) the final SubpelConv — shared by
        g_s and g_s_phase so the two cannot drift."""
        for layer in (self.g_s_0, self.g_s_1, self.g_s_2, self.g_s_3,
                      self.g_s_4, self.g_s_5, self.g_s_6):
            y = layer(y)
        return y

    def g_s(self, y):
        return self.g_s_7(self._g_s_body(y))

    def g_s_phase(self, y):
        """Synthesis in the final SubpelConv's phase space, NCHW
        (n, 12, H/2, W/2).  Channel order is pixel_shuffle's
        (c*r*r + i*r + j) — a fixed permutation of the base class's
        depth-to-space order, which is irrelevant to the MSE-invariant
        phase-space attack loss (both sides of the diff use this same
        mapping)."""
        return self.g_s_7(self._g_s_body(y), phase_output=True)

    def h_a(self, y):
        h = nn.leaky_relu(self.h_a_0(y))
        h = nn.leaky_relu(self.h_a_2(h))
        h = self.h_a_4(h)
        h = nn.leaky_relu(h)
        h = nn.leaky_relu(self.h_a_6(h))
        return self.h_a_8(h)

    def h_s(self, z):
        h = nn.leaky_relu(self.h_s_0(z))
        h = nn.leaky_relu(self.h_s_2(h))
        h = nn.leaky_relu(self.h_s_4(h))
        h = nn.leaky_relu(self.h_s_6(h))
        return self.h_s_8(h)


class Cheng2020Attention(Cheng2020Anchor):
    """cheng2020-attn: the anchor transforms with attention blocks after the
    second and final analysis stages and mirrored in synthesis (the
    "attention" codec of BASELINE.json's config list)."""

    N: int
    M: int

    def setup(self):
        super().setup()
        n = self.N
        self.g_a_attn_1 = AttentionBlock(n)
        self.g_a_attn_2 = AttentionBlock(n)
        self.g_s_attn_0 = AttentionBlock(n)
        self.g_s_attn_1 = AttentionBlock(n)

    def g_a(self, x):
        x = self.g_a_0(x)
        x = self.g_a_1(x)
        x = self.g_a_2(x)
        x = self.g_a_attn_1(x)
        x = self.g_a_3(x)
        x = self.g_a_4(x)
        x = self.g_a_5(x)
        x = self.g_a_6(x)
        return self.g_a_attn_2(x)

    def _g_s_body(self, y):
        y = self.g_s_attn_0(y)
        y = self.g_s_0(y)
        y = self.g_s_1(y)
        y = self.g_s_2(y)
        y = self.g_s_3(y)
        y = self.g_s_attn_1(y)
        y = self.g_s_4(y)
        y = self.g_s_5(y)
        return self.g_s_6(y)


class Cheng2020AttnGMM(Cheng2020Attention):
    """cheng2020 attention transforms + K-component Gaussian-mixture
    conditional (the paper's full model; K=3).  The entropy-parameters head
    emits 3*K*M channels: per-component scales, means, mixture logits."""

    N: int
    M: int
    K: int = 3
    entropy_structure = "context_gmm"
    # construct with ep_final_width = 3*K*N (registry does)

    def __call__(self, x, quant_mode: str = "noise") -> Result:
        return self.from_latent(self.g_a(x), quant_mode)

    def from_latent(self, y, quant_mode: str = "noise") -> Result:
        from ..entropy.gaussian import gaussian_mixture_conditional

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
        gp = self.entropy_parameters(jnp.concatenate([params, ctx], axis=-1))
        b, h, w, _ = gp.shape
        gp = gp.reshape(b, h, w, 3, self.K, self.M).transpose(0, 1, 2, 5, 4, 3)
        scales = gp[..., 0]  # (B, H, W, M, K)
        means = gp[..., 1]
        logits = gp[..., 2]
        rng_lik = _maybe_rng(self, quant_mode)
        _, y_lik = gaussian_mixture_conditional(
            y, scales, means, logits, quant_mode=quant_mode, key=rng_lik
        )
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "y": y,
            "y_hat": y_hat,
            "z_hat": z_hat,
            "likelihoods": {"y": y_lik, "z": z_lik},
        }


class DebugCodec(CodecModel):
    """The reference's one-layer autoencoder fixture `ae_onelayer`
    (`/root/reference/anchors/model.py:9-35`): 3x3 stride-1 analysis /
    synthesis over a mean-scale hyper entropy structure; synthesis bypasses
    quantization entirely (x_hat = g_s(y))."""

    N: int = 3
    M: int = 192

    def setup(self):
        self.g_a_0 = Conv(self.M, kernel_size=3, stride=1)
        self.g_s_0 = Deconv(3, kernel_size=3, stride=1)

        self.h_a_0 = Conv(self.N, kernel_size=3, stride=1)
        self.h_a_2 = Conv(self.N)
        self.h_a_4 = Conv(self.N)

        self.h_s_0 = Deconv(self.M)
        self.h_s_2 = Deconv(self.M * 3 // 2)
        self.h_s_4 = Conv(self.M * 2, kernel_size=3, stride=1)

        self.entropy_bottleneck = EntropyBottleneck(self.N)

    def g_a(self, x):
        return self.g_a_0(x)

    def g_s(self, y):
        return self.g_s_0(y)

    def h_a(self, y):
        h = nn.leaky_relu(self.h_a_0(y))
        h = nn.leaky_relu(self.h_a_2(h))
        return self.h_a_4(h)

    def h_s(self, z):
        h = nn.leaky_relu(self.h_s_0(z))
        h = nn.leaky_relu(self.h_s_2(h))
        return self.h_s_4(h)

    def __call__(self, x, quant_mode: str = "noise") -> Result:
        return self.from_latent(self.g_a(x), quant_mode)

    def from_latent(self, y, quant_mode: str = "noise") -> Result:
        z = self.h_a(y)
        rng = _maybe_rng(self, quant_mode)
        z_hat, z_lik = self.entropy_bottleneck(z, quant_mode=quant_mode, key=rng)
        gaussian_params = self.h_s(z_hat)
        scales, means = jnp.split(gaussian_params, 2, axis=-1)
        rng_y = _maybe_rng(self, quant_mode)
        y_hat, y_lik = gaussian_conditional(
            y, scales, means=means, quant_mode=quant_mode, key=rng_y
        )
        x_hat = self.g_s(y)  # deliberate quantization bypass (ref :30)
        return {
            "x_hat": x_hat,
            "y": y,
            "y_hat": y_hat,
            "z_hat": z_hat,
            "likelihoods": {"y": y_lik, "z": z_lik},
        }

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()
