"""Bound operators with straight-through / gradient-gated backward passes.

These reproduce the gradient semantics of the reference autograd functions
(`/root/reference/utils/ops.py:8-56`) as `jax.custom_vjp` primitives:

* ``lower_bound(x, b)``  — forward ``max(x, b)``; gradient passes through when
  the input is inside the bound (``x >= b``) *or* when the gradient points
  back inside it (``g < 0``, i.e. gradient descent would increase x).
* ``upper_bound(x, b)``  — forward ``min(x, b)``; symmetric gating
  (``x <= b`` or ``g > 0``).
* ``ste_round(x)``       — round with identity gradient.
* ``universal_quant``    — round with shared uniform dither, identity gradient.

The conditional gating is what lets the RD attack keep optimising a noise
variable that is clipped to an eps-ball every step (ref attack loop at
`/root/reference/attack_rd.py:507,517`): gradients that would pull the
variable back inside the ball are never masked, so saturated pixels can
recover.  A plain ``clip``+``stop_gradient`` would dead-zone them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x, bound):
    """max(x, bound) with gradient-gated backward (see module docstring)."""
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0.0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


@jax.custom_vjp
def upper_bound(x, bound):
    """min(x, bound) with gradient-gated backward (see module docstring)."""
    return jnp.minimum(x, bound)


def _upper_bound_fwd(x, bound):
    return jnp.minimum(x, bound), (x, bound)


def _upper_bound_bwd(res, g):
    x, bound = res
    pass_through = (x <= bound) | (g > 0.0)
    return (jnp.where(pass_through, g, 0.0), None)


upper_bound.defvjp(_upper_bound_fwd, _upper_bound_bwd)


def bound_clip(x, low, high):
    """Clip to [low, high] through the gated-STE bounds.

    Equivalent of the reference's ``Up_bound.apply(Low_bound.apply(x, low), high)``
    idiom (`/root/reference/attack_rd.py:507`).
    """
    return upper_bound(lower_bound(x, low), high)


@jax.custom_vjp
def ste_round(x):
    """round(x) with identity gradient (ref `utils/ops.py:8-15`)."""
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


@jax.custom_vjp
def _universal_quant_core(x, u):
    return jnp.round(x + u) - u


def _universal_quant_fwd(x, u):
    return jnp.round(x + u) - u, None


def _universal_quant_bwd(_, g):
    return (g, None)


_universal_quant_core.defvjp(_universal_quant_fwd, _universal_quant_bwd)


def universal_quant(x, key):
    """Universal quantization: round with shared uniform(-0.5, 0.5) dither.

    Identity gradient (ref `utils/ops.py:17-25`).  The dither is drawn from an
    explicit PRNG key instead of global torch RNG state.
    """
    u = jax.random.uniform(key, x.shape, x.dtype, minval=-0.5, maxval=0.5)
    return _universal_quant_core(x, u)
