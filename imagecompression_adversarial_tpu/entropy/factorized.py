"""Fully-factorized entropy bottleneck (Balle 2018 non-parametric prior).

Re-implementation of the univariate density model CompressAI's
``EntropyBottleneck`` provides (reached from the reference through
``net.entropy_bottleneck`` — `/root/reference/anchors/model.py:88-99`).
Each channel owns a small monotone MLP in CDF-logit space::

    logits_{k+1} = softplus(H_k) @ logits_k + b_k          (matmul over filters)
    logits_{k+1} += tanh(a_k) * tanh(logits_{k+1})         (all but last layer)

    P(v) = sigmoid(logits(v + 1/2)) - sigmoid(logits(v - 1/2))

evaluated per channel on the quantized latent.  A ``quantiles`` parameter
(C, 1, 3) tracks the (tail, median, tail) points; the auxiliary loss pushes
the learned CDF to hit the target tail mass there.  The reference trains it
with a dedicated Adam over exactly the ``.quantiles`` parameters
(`/root/reference/coder.py:57-67`), which we mirror via the parameter name.

TPU notes: evaluation is a batched (C, d_out, d_in) x (C, d_in, N) einsum
chain — a few tiny matmuls fused by XLA; everything is static-shaped and
vmap/pjit friendly.  Layout here is channel-major (C, 1, N) regardless of the
NHWC activation layout used by the codecs.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.bounds import lower_bound
from ..ops.quant import quantize

_LIKELIHOOD_BOUND = 1e-9


def eb_logits_cumulative(params, inputs, stop_gradient: bool = False):
    """CDF-logit chain as a pure function of the EB parameter dict.

    ``params`` holds matrix_k (C, d_out, d_in), bias_k (C, d_out, 1) and
    factor_k (C, d_out, 1); ``inputs`` has shape (C, 1, N).  Shared by the
    linen module and the range-coder table builder (entropy/tables.py).
    """
    n_layers = len([k for k in params if k.startswith("matrix_")])
    logits = inputs
    for k in range(n_layers):
        matrix = params[f"matrix_{k}"]
        bias = params[f"bias_{k}"]
        if stop_gradient:
            matrix = jax.lax.stop_gradient(matrix)
            bias = jax.lax.stop_gradient(bias)
        logits = jnp.einsum("cof,cfn->con", jax.nn.softplus(matrix), logits) + bias
        if k < n_layers - 1:
            factor = params[f"factor_{k}"]
            if stop_gradient:
                factor = jax.lax.stop_gradient(factor)
            logits = logits + jnp.tanh(factor) * jnp.tanh(logits)
    return logits


def eb_likelihood(params, inputs):
    """Unit-bin likelihood as a pure function; ``inputs`` (C, 1, N)."""
    lower = eb_logits_cumulative(params, inputs - 0.5)
    upper = eb_logits_cumulative(params, inputs + 0.5)
    sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
    return jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))


class EntropyBottleneck(nn.Module):
    """Per-channel non-parametric entropy model.

    Attributes:
      channels: number of latent channels C.
      filters: hidden widths of the CDF-logit MLP.
      init_scale: initial quantile spread.
      tail_mass: total probability mass allowed outside the quantile range.
    """

    channels: int
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9

    def setup(self):
        dims = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1.0 / (len(self.filters) + 1))
        self._dims = dims

        matrices, biases, factors = [], [], []
        for k in range(len(dims) - 1):
            init = math.log(math.expm1(1.0 / scale / dims[k + 1]))
            matrices.append(
                self.param(
                    f"matrix_{k}",
                    lambda rng, shape, v=init: jnp.full(shape, v, jnp.float32),
                    (self.channels, dims[k + 1], dims[k]),
                )
            )
            biases.append(
                self.param(
                    f"bias_{k}",
                    lambda rng, shape: jax.random.uniform(
                        rng, shape, jnp.float32, -0.5, 0.5
                    ),
                    (self.channels, dims[k + 1], 1),
                )
            )
            if k < len(dims) - 2:
                factors.append(
                    self.param(
                        f"factor_{k}",
                        nn.initializers.zeros,
                        (self.channels, dims[k + 1], 1),
                    )
                )
        self._matrices = matrices
        self._biases = biases
        self._factors = factors

        def quantile_init(rng, shape):
            base = jnp.array([-self.init_scale, 0.0, self.init_scale], jnp.float32)
            return jnp.tile(base.reshape(1, 1, 3), (shape[0], 1, 1))

        self.quantiles = self.param("quantiles", quantile_init, (self.channels, 1, 3))

    # ------------------------------------------------------------------ core

    def _param_dict(self):
        d = {}
        for k, m in enumerate(self._matrices):
            d[f"matrix_{k}"] = m
        for k, b in enumerate(self._biases):
            d[f"bias_{k}"] = b
        for k, f in enumerate(self._factors):
            d[f"factor_{k}"] = f
        return d

    def _logits_cumulative(self, inputs: jax.Array, stop_gradient: bool) -> jax.Array:
        """CDF logits; ``inputs`` has shape (C, 1, N)."""
        return eb_logits_cumulative(self._param_dict(), inputs, stop_gradient)

    def _likelihood(self, inputs: jax.Array) -> jax.Array:
        """Pointwise likelihoods; ``inputs`` has shape (C, 1, N)."""
        return eb_likelihood(self._param_dict(), inputs)

    @property
    def medians(self) -> jax.Array:
        return self.quantiles[:, 0, 1]

    # ------------------------------------------------------------- interface

    def __call__(
        self,
        z: jax.Array,
        quant_mode: str = "noise",
        key: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Quantize ``z`` (NHWC) and return (z_hat, likelihoods).

        ``quant_mode`` follows `ops.quant.quantize`; round-based modes are
        centered on the learned per-channel medians (CompressAI semantics).
        """
        b, h, w, c = z.shape
        if quant_mode == "noise" and key is None:
            key = self.make_rng("quant")
        medians = self.medians  # (C,)
        means = medians.reshape(1, 1, 1, c) if quant_mode in ("dequantize", "ste") else None
        z_hat = quantize(z, quant_mode, means=means, key=key)

        # (B, H, W, C) -> (C, 1, B*H*W)
        flat = z_hat.transpose(3, 0, 1, 2).reshape(c, 1, -1)
        likelihood = self._likelihood(flat)
        likelihood = lower_bound(likelihood, _LIKELIHOOD_BOUND)
        # back to NHWC
        likelihood = likelihood.reshape(c, b, h, w).transpose(1, 2, 3, 0)
        return z_hat, likelihood

    def aux_loss(self) -> jax.Array:
        """Quantile-fitting loss (the reference's dedicated aux optimizer
        target, `/root/reference/coder.py:82-85`)."""
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        tail = math.log(2.0 / self.tail_mass - 1.0)
        target = jnp.array([-tail, 0.0, tail], jnp.float32).reshape(1, 1, 3)
        return jnp.sum(jnp.abs(logits - target))
