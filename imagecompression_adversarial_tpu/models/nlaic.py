"""NLAIC-family codec: non-local attention image compression.

The reference ports its attack to the external NLAIC repo
(`/root/reference/attack_nlaic.py:16-17` imports ``Model.model`` and the
``Weighted_Gaussian`` context model; 16 fixed-lambda checkpoints,
`attack_nlaic.py:56-61`).  This module provides the family in-framework:
convolutional transforms interleaved with Non-Local Attention Modules
(NLAM — a trunk of residual units gated by a mask branch whose first stage
is true non-local (global) self-attention), over the joint autoregressive
entropy structure.

TPU notes: the non-local block is a (HW x HW) attention at latent
resolutions — a pair of big MXU matmuls; everything stays static-shaped.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .codecs import JointAutoregressive
from .layers import Conv, ResidualUnit


class NonLocalBlock(nn.Module):
    """Embedded-Gaussian non-local attention: softmax((th x)(phi x)^T) g(x)."""

    features: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inter = max(self.features // 2, 1)
        theta = Conv(inter, kernel_size=1, stride=1, name="theta")(x)
        phi = Conv(inter, kernel_size=1, stride=1, name="phi")(x)
        g = Conv(inter, kernel_size=1, stride=1, name="g")(x)

        q = theta.reshape(b, h * w, inter)
        k = phi.reshape(b, h * w, inter)
        v = g.reshape(b, h * w, inter)
        attn = jax.nn.softmax(
            jnp.einsum("bnd,bmd->bnm", q, k) / jnp.sqrt(inter).astype(x.dtype),
            axis=-1,
        )
        out = jnp.einsum("bnm,bmd->bnd", attn, v).reshape(b, h, w, inter)
        out = Conv(self.features, kernel_size=1, stride=1, name="out")(out)
        return x + out


class NLAM(nn.Module):
    """Non-Local Attention Module: residual trunk gated by a sigmoid mask
    branch headed by a non-local block (NLAIC's core component)."""

    features: int

    @nn.compact
    def __call__(self, x):
        trunk = x
        for i in range(3):
            trunk = ResidualUnit(self.features, name=f"trunk_{i}")(trunk)
        mask = NonLocalBlock(self.features, name="nonlocal")(x)
        for i in range(3):
            mask = ResidualUnit(self.features, name=f"mask_{i}")(mask)
        mask = Conv(self.features, kernel_size=1, stride=1, name="mask_conv")(mask)
        return x + trunk * jax.nn.sigmoid(mask)


class NLAIC(JointAutoregressive):
    """Non-local attention transforms over the joint-AR entropy structure.

    Analysis: 4 strided conv stages with NLAMs after stages 2 and 4 (NLAM at
    the /4 and /16 scales, as in the paper); synthesis mirrored.
    """

    N: int
    M: int

    supports_phase_synthesis = True  # own g_s_phase below (NLAM-aware)

    def setup(self):
        n, m = self.N, self.M
        super().setup()
        self.g_a_nlam_1 = NLAM(n)
        self.g_a_nlam_2 = NLAM(m)
        self.g_s_nlam_0 = NLAM(m)
        self.g_s_nlam_1 = NLAM(n)

    def g_a(self, x):
        x = self.g_a_0(x)  # conv s2
        x = self.g_a_1(x)  # GDN
        x = self.g_a_2(x)
        x = self.g_a_3(x)
        x = self.g_a_nlam_1(x)
        x = self.g_a_4(x)
        x = self.g_a_5(x)
        x = self.g_a_6(x)
        return self.g_a_nlam_2(x)

    def _g_s_body(self, y):
        """NLAM-interleaved synthesis up to (not including) the final
        Deconv(3) — shared by g_s and g_s_phase.  (The base CodecModel
        g_s_phase would silently SKIP the NLAM blocks.)"""
        y = self.g_s_nlam_0(y)
        y = self.g_s_0(y)
        y = self.g_s_1(y)
        y = self.g_s_2(y)
        y = self.g_s_3(y)
        y = self.g_s_nlam_1(y)
        y = self.g_s_4(y)
        return self.g_s_5(y)

    def g_s(self, y):
        return self.g_s_6(self._g_s_body(y))

    def g_s_phase(self, y):
        return self.g_s_6(self._g_s_body(y), phase_output=True)
