"""fic-family codec: the Weixin2021 CLIC "fast image compression" model.

The reference ports its attack to an external CLIC codec
(`/root/reference/attack_fic.py:12-14` imports ``model_clic.Image_coding``
and ``fast_context_model.Context4``; attack surface at :40-84).  Its public
decomposition, which this module rebuilds in-framework:

  ``encoder(x) -> (y, z)``        one call yields BOTH the main latent and
                                  the hyper latent (ref :42)
  ``factorized_entropy_func(z)``  factorized prior on the hyper latent (:43)
  ``hyper_dec(z_hat)``            hyper-synthesis to conditioning features (:44)
  ``gaussin_entropy_func``        hyper-only Gaussian likelihoods (:115)
  ``Context4(y_q, hyper_feats)``  the FAST context model: likelihoods of the
                                  quantized main latent given hyper features
                                  + already-known neighbours (:49)
  ``decoder(y)``                  synthesis from the UN-quantized latent —
                                  both the attack loop and the eval path
                                  decode ``x1`` directly (:50, :121)

TPU-first re-design of Context4: instead of a pixel-sequential masked conv,
the latent is split into 4 checkerboard phases of a 2x2 cell.  Phase k is
conditioned on the hyper features plus the (spatially masked) union of
phases < k — so estimation is 4 parallel conv stacks in ONE forward pass
(no sequential scan), and the real decoder needs only 4 passes rather
than H*W (implemented: `entropy/codec.py` ``context4`` branch — one-pass
encode, 4-pass decode, bit-exact round-trip tested in
`tests/test_autoregressive.py`).  This is the published "parallel
context" trick re-expressed in
XLA-friendly form; estimation-path rate parity with a sequential context
model is preserved because each symbol still conditions only on
already-decoded symbols.

Attack note: because fic decodes the UN-quantized latent, the attack's
output path is bitwise identical to the clean reference at noise=0 — the
two-phase loss starts at an exact critical point and zero-initialized
Adam cannot leave it on a deterministic backend.  The reference has the
same degeneracy (its random init is commented out, `attack_fic.py:58-59`;
on GPU, nondeterministic kernels provide the escape jitter).  Attack fic
with ``-random >= 2`` (uniform noise init, the reference's own
alternative) — measured on-chip in RESULTS.md.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.factorized import EntropyBottleneck
from ..entropy.gaussian import gaussian_conditional
from ..ops.quant import quantize
from .codecs import CodecModel, Result, _maybe_rng
from .layers import Conv, Deconv, GDN


def _phase_masks(h: int, w: int, dtype) -> jnp.ndarray:
    """(4, H, W, 1) binary masks of the 2x2-cell checkerboard phases, in
    decode order (0,0) -> (1,1) -> (0,1) -> (1,0)."""
    ii, jj = np.mgrid[0:h, 0:w]
    order = [(0, 0), (1, 1), (0, 1), (1, 0)]
    masks = np.stack(
        [((ii % 2 == a) & (jj % 2 == b)) for a, b in order]
    ).astype(np.float32)[..., None]
    return jnp.asarray(masks, dtype)


class Context4(nn.Module):
    """4-phase parallel context model (the ``fast_context_model.Context4``
    analog, ref `attack_fic.py:14,49`).

    For each phase k: params_k = conv-stack([hyper_feats, y_hat * visible_k])
    where visible_k masks in only phases strictly before k in decode order.
    Emits per-pixel (scale, mean); only phase-k pixels of params_k are used.
    """

    M: int
    hidden: int = 192

    @nn.compact
    def __call__(self, y_hat, hyper_feats):
        b, h, w, m = y_hat.shape
        masks = _phase_masks(h, w, y_hat.dtype)  # (4, H, W, 1)

        scales = jnp.zeros_like(y_hat)
        means = jnp.zeros_like(y_hat)
        visible = jnp.zeros((1, h, w, 1), y_hat.dtype)
        for k in range(4):
            ctx = jnp.concatenate([hyper_feats, y_hat * visible], axis=-1)
            f = nn.leaky_relu(
                Conv(self.hidden, kernel_size=5, stride=1, name=f"ctx{k}_0")(ctx)
            )
            f = nn.leaky_relu(
                Conv(self.hidden, kernel_size=5, stride=1, name=f"ctx{k}_2")(f)
            )
            params = Conv(2 * self.M, kernel_size=1, stride=1, name=f"ctx{k}_4")(f)
            s_k, m_k = jnp.split(params, 2, axis=-1)
            phase = masks[k][None]  # (1, H, W, 1)
            scales = scales + s_k * phase
            means = means + m_k * phase
            visible = visible + phase
        return scales, means


class FIC(CodecModel):
    """Weixin2021 CLIC codec (``model_clic.Image_coding(3, 32, 192, 42, 64)``,
    ref `attack_fic.py:148`): conv/GDN analysis-synthesis, hyper branch
    folded into the encoder, Context4 entropy over the main latent, and a
    synthesis path that decodes the un-quantized latent (ref :50,:121)."""

    N: int
    M: int
    entropy_structure = "context4"
    supports_phase_synthesis = True  # base g_s_0..g_s_6 chain applies
    # fic synthesizes the UN-quantized latent, so the phase-space clean
    # reference must be built from result["y"], not y_hat (line 200)
    phase_reference_latent = "y"

    def setup(self):
        n, m = self.N, self.M
        self.g_a_0 = Conv(n)
        self.g_a_1 = GDN()
        self.g_a_2 = Conv(n)
        self.g_a_3 = GDN()
        self.g_a_4 = Conv(n)
        self.g_a_5 = GDN()
        self.g_a_6 = Conv(m)

        self.g_s_0 = Deconv(n)
        self.g_s_1 = GDN(inverse=True)
        self.g_s_2 = Deconv(n)
        self.g_s_3 = GDN(inverse=True)
        self.g_s_4 = Deconv(n)
        self.g_s_5 = GDN(inverse=True)
        self.g_s_6 = Deconv(3)

        # hyper branch (z ~ N/3 channels like the 64-vs-192 reference widths)
        hyper_ch = max(self.N // 3, 8)
        self.h_a_0 = Conv(hyper_ch, kernel_size=3, stride=1)
        self.h_a_2 = Conv(hyper_ch)
        self.h_a_4 = Conv(hyper_ch)

        self.h_s_0 = Deconv(self.M)
        self.h_s_2 = Deconv(self.M * 3 // 2)
        self.h_s_4 = Conv(self.M * 2, kernel_size=3, stride=1)

        self.entropy_bottleneck = EntropyBottleneck(hyper_ch)
        self.context = Context4(M=self.M, hidden=self.N)

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

    def encoder(self, x):
        """(y, z) in one call — the reference's two-output encoder (:42)."""
        y = self.g_a(x)
        return y, self.h_a(y)

    def decoder(self, y):
        return self.g_s(y)

    def __call__(self, x, quant_mode: str = "noise") -> Result:
        return self.from_latent(self.g_a(x), quant_mode)

    def from_latent(self, y, quant_mode: str = "noise") -> Result:
        z = self.h_a(y)
        rng = _maybe_rng(self, quant_mode)
        z_hat, z_lik = self.entropy_bottleneck(z, quant_mode=quant_mode, key=rng)
        hyper_feats = self.h_s(z_hat)

        rng_y = _maybe_rng(self, quant_mode)
        y_hat = quantize(
            y,
            "dequantize" if quant_mode in ("dequantize", "ste") else quant_mode,
            means=None,
            key=rng_y,
        )
        scales, means = self.context(y_hat, hyper_feats)
        rng_lik = _maybe_rng(self, quant_mode)
        # means_free_round: the context4 real coder writes plain round(y)
        # symbols (entropy/codec.py::_context4_encode), so the estimate must
        # integrate the Gaussian over [round(y)-.5, round(y)+.5] — NOT over
        # the mean-centered bin.  Mean-centered estimation under-reported
        # the trained fic demo's wire rate by 43% (RESULTS.md round 5).
        _, y_lik = gaussian_conditional(
            y, scales, means=means, quant_mode=quant_mode, key=rng_lik,
            means_free_round=True,
        )
        # fic decodes the un-quantized latent (ref `attack_fic.py:50,121`)
        x_hat = self.g_s(y)
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
