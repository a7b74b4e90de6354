"""Fused Pallas GDN kernel — DEMOTED to a benchmark harness (round 4).

History: written in round 1 as the TPU-native equivalent of CompressAI's
GDN CUDA kernel (SURVEY §2.6), it lost to XLA's own fusion in both honest
measurements (1.9 vs 1.1 ms micro at (1,384,256,192), round 1; 101.6 vs
138 attack steps/s end-to-end, round 2 — RESULTS.md).  The shipping GDN
(`models/layers.py`) is the plain einsum XLA fuses itself; this file stays
only as the harness for future tile/dtype experiments
(`scripts/perf_gdn_tiles.py`).  Run `python scripts/pallas_gdn.py` for an
interpret-mode correctness self-check.

GDN is ``out = x / sqrt(beta + gamma @ x^2)`` (IGDN multiplies).  Lowered
naively this is: square (VPU) -> channel matmul (MXU) -> bias add -> rsqrt
-> multiply, with x^2 and the norm round-tripping through HBM.  The kernel
keeps one (TILE_N, C) row-block of x resident in VMEM, does the x^2 matmul
on the MXU, and applies bias+rsqrt+mul in-register — one HBM read of x and
one write of out.

The backward pass is closed-form and stays in XLA (two matmuls + elementwise
— XLA fuses those well already; the forward is the memory-bound half):

  r      = rsqrt(norm)                     (saved via recompute)
  dnorm  = -1/2 * g * x * r^3              (GDN)   /  +1/2 * g * x / r (IGDN)
  dx     = g * r + 2 x * (dnorm @ gamma)   (gamma: (C_out, C_in), norm_o =
                                            sum_i gamma[o,i] x_i^2 + beta_o)
  dgamma = dnorm^T @ x^2
  dbeta  = sum_n dnorm

Use `gdn_fused(x, gamma, beta, inverse)` with reparametrized-resolved gamma/
beta (the bound/pedestal algebra stays outside, it is parameter-space work).
``interpret=True`` runs the kernel in interpreter mode (CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend may be unavailable on CPU-only builds
    from jax.experimental.pallas import tpu as pltpu

    _MEMSPACE = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _MEMSPACE = None

_TILE_N = 512  # default row-block; override per call via tile_n


def set_default_tile(n: int) -> None:
    """Set the module default row-block (used by the GDN module path)."""
    global _TILE_N
    _TILE_N = n


def _gdn_kernel(x_ref, gamma_ref, beta_ref, out_ref, *, inverse: bool):
    x = x_ref[:]
    gamma = gamma_ref[:]
    beta = beta_ref[:]
    # norm[n, o] = sum_i x[n, i]^2 * gamma[o, i] + beta[o]
    norm = jax.lax.dot_general(
        x * x,
        gamma,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + beta[None, :]
    if inverse:
        out_ref[:] = x * jnp.sqrt(norm)
    else:
        out_ref[:] = x * jax.lax.rsqrt(norm)


def _gdn_forward(x2d, gamma, beta, inverse: bool, interpret: bool,
                 tile_n: int = 0):
    n, c = x2d.shape
    tile = min(tile_n or _TILE_N, n)
    n_pad = ((n + tile - 1) // tile) * tile
    if n_pad != n:
        x2d = jnp.pad(x2d, ((0, n_pad - n), (0, 0)))

    kwargs = {}
    if _MEMSPACE is not None and not interpret:
        in_specs = [
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=_MEMSPACE),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=_MEMSPACE),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=_MEMSPACE),
        ]
        out_specs = pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=_MEMSPACE)
    else:
        in_specs = [
            pl.BlockSpec((tile, c), lambda i: (i, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ]
        out_specs = pl.BlockSpec((tile, c), lambda i: (i, 0))

    out = pl.pallas_call(
        functools.partial(_gdn_kernel, inverse=inverse),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), x2d.dtype),
        grid=(n_pad // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        **kwargs,
    )(x2d, gamma, beta)
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gdn_fused(x, gamma, beta, inverse: bool = False, interpret: bool = False):
    """Fused GDN/IGDN on NHWC ``x`` with resolved gamma (C,C) / beta (C,)."""
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    out = _gdn_forward(x2d, gamma, beta, inverse, interpret)
    return out.reshape(shape)


def _gdn_fused_fwd(x, gamma, beta, inverse, interpret):
    return gdn_fused(x, gamma, beta, inverse, interpret), (x, gamma, beta)


def _gdn_fused_bwd(inverse, interpret, res, g):
    x, gamma, beta = res
    shape = x.shape
    c = shape[-1]
    x2d = x.reshape(-1, c)
    g2d = g.reshape(-1, c)

    x_sq = x2d * x2d
    norm = x_sq @ gamma.T + beta[None, :]
    if inverse:
        s = jnp.sqrt(norm)
        # out = x * s; dnorm = g * x * 0.5 / s
        dnorm = 0.5 * g2d * x2d / s
        dx_direct = g2d * s
    else:
        r = jax.lax.rsqrt(norm)
        dnorm = -0.5 * g2d * x2d * (r * r * r)
        dx_direct = g2d * r

    dx = dx_direct + 2.0 * x2d * (dnorm @ gamma)
    dgamma = dnorm.T @ x_sq
    dbeta = jnp.sum(dnorm, axis=0)
    return dx.reshape(shape), dgamma, dbeta


gdn_fused.defvjp(_gdn_fused_fwd, _gdn_fused_bwd)


if __name__ == "__main__":
    # interpret-mode correctness self-check vs the shipping XLA math
    # (replaces the deleted tests/test_pallas_gdn.py after the demotion)
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    key = jax.random.PRNGKey(0)
    c = 16
    x = jax.random.normal(key, (2, 8, 8, c), jnp.float32)
    gamma = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (c, c))) * 0.1
    beta = jnp.ones((c,)) * 0.5
    for inverse in (False, True):
        ref_norm = jnp.einsum("...i,oi->...o", x * x, gamma) + beta
        ref = x * (jnp.sqrt(ref_norm) if inverse else jax.lax.rsqrt(ref_norm))
        out = gdn_fused(x, gamma, beta, inverse, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        g = jax.grad(lambda x: jnp.sum(gdn_fused(x, gamma, beta, inverse, True) ** 2))(x)
        g_ref = jax.grad(lambda x: jnp.sum((x * (jnp.sqrt(jnp.einsum("...i,oi->...o", x * x, gamma) + beta) if inverse else jax.lax.rsqrt(jnp.einsum("...i,oi->...o", x * x, gamma) + beta))) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)
    print("pallas_gdn interpret-mode self-check: OK")
