"""LPIPS perceptual distance with a pluggable feature network.

The reference uses the ``lpips`` package's AlexNet variant as a training
metric branch (`/root/reference/train.py:47,92-94`) and HiFiC's perceptual
term.  The zero-egress sandbox has no pretrained AlexNet, so this module
separates the *math* (channel-unit-normalized feature differences, learned
non-negative per-channel weights, spatial mean, layer sum — exactly the
published LPIPS formula) from the *feature extractor*, which is any module
returning a list of feature maps:

  * ``AlexFeatureNet`` mirrors AlexNet's five conv stages (64/192/384/256/
    256, stride-4 stem), so converted real LPIPS(alex) weights drop in;
  * randomly initialized features are the documented sandbox default —
    random-conv perceptual distances are a standard proxy (same policy as
    `metrics/fid.py`'s feature callable).

Everything is differentiable and jit-safe: `make_lpips_fn` closes over
numpy-cached parameters (converted at call, never traced-cached —
CLAUDE.md tracer-leak rule).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class AlexFeatureNet(nn.Module):
    """AlexNet-shaped feature trunk: returns the post-ReLU activations of
    the five conv stages (the taps LPIPS(alex) uses).

    ``in_shift``/``in_scale`` mirror the lpips package's ScalingLayer
    (per-channel input normalization applied BEFORE conv0 and hence before
    its zero padding — folding it into conv0 would be wrong at borders);
    they initialize to identity (0/1) so random-init behavior is unchanged,
    and `io.convert_lpips` fills them from a real checkpoint."""

    widths: Sequence[int] = (64, 192, 384, 256, 256)

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        feats = []
        w = self.widths
        shift = self.param("in_shift", nn.initializers.zeros, (3,))
        scale = self.param("in_scale", nn.initializers.ones, (3,))
        x = (x - shift) / scale
        x = nn.relu(nn.Conv(w[0], (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)),
                            name="conv0")(x))
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(w[1], (5, 5), padding=((2, 2), (2, 2)), name="conv1")(x))
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(w[2], (3, 3), padding=((1, 1), (1, 1)), name="conv2")(x))
        feats.append(x)
        x = nn.relu(nn.Conv(w[3], (3, 3), padding=((1, 1), (1, 1)), name="conv3")(x))
        feats.append(x)
        x = nn.relu(nn.Conv(w[4], (3, 3), padding=((1, 1), (1, 1)), name="conv4")(x))
        feats.append(x)
        return feats


class LPIPS(nn.Module):
    """LPIPS distance head over a feature trunk.

    d(a, b) = sum_l mean_hw( w_l . (unit(F_l(a)) - unit(F_l(b)))^2 )
    with non-negative learned per-channel weights w_l (1x1 convs).
    Inputs are NHWC in [0, 1]; internally shifted to the [-1, 1] range the
    published nets expect.
    """

    widths: Sequence[int] = (64, 192, 384, 256, 256)

    @nn.compact
    def __call__(self, a, b) -> jax.Array:
        trunk = AlexFeatureNet(self.widths, name="features")
        fa = trunk(a * 2.0 - 1.0)
        fb = trunk(b * 2.0 - 1.0)
        total = jnp.asarray(0.0, a.dtype)
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa * jax.lax.rsqrt(jnp.sum(xa * xa, -1, keepdims=True) + 1e-10)
            nb = xb * jax.lax.rsqrt(jnp.sum(xb * xb, -1, keepdims=True) + 1e-10)
            diff2 = (na - nb) ** 2
            # abs() keeps the head non-negative regardless of init/training
            w = jnp.abs(
                self.param(f"lin{i}", nn.initializers.ones, (diff2.shape[-1],))
            )
            total = total + jnp.mean(jnp.sum(diff2 * w, axis=-1))
        return total


def make_lpips_fn(seed: int = 0, image_hw: int = 64) -> Callable:
    """Build a differentiable ``(a, b) -> scalar`` LPIPS callable with
    randomly initialized features (sandbox default; pass converted real
    weights via :func:`lpips_fn_from_params` when available)."""
    module = LPIPS()
    # ensure_compile_time_eval: the lazy default may be built while tracing
    # a jitted train step — the init must still produce CONCRETE params
    # (np-cacheable), not tracers.
    with jax.ensure_compile_time_eval():
        x = jnp.zeros((1, image_hw, image_hw, 3), jnp.float32)
        params = module.init(jax.random.PRNGKey(seed), x, x)["params"]
    return lpips_fn_from_params(params)


def lpips_fn_from_params(params) -> Callable:
    """Close over an LPIPS parameter pytree (numpy-cached, converted per
    call) and return the differentiable distance function."""
    module = LPIPS()
    params_np = jax.tree_util.tree_map(np.asarray, params)

    def distance(a, b):
        p = jax.tree_util.tree_map(jnp.asarray, params_np)
        return module.apply({"params": p}, a, b)

    return distance


def alex_feature_fn_from_params(params, layer: int = -1) -> Callable:
    """(N, H, W, 3) [0,1] -> (N, C) pooled trunk activations: an FID/KID
    feature extractor (`metrics.fid` feature_fn) backed by the same
    AlexFeatureNet, so converted real weights (`io.convert_lpips`) serve
    the distribution metrics too (VERDICT r4 #8).  ``params`` is either a
    full LPIPS pytree (its 'features' subtree is used) or a bare trunk."""
    module = AlexFeatureNet()
    trunk = params.get("features", params) if hasattr(params, "get") else params
    params_np = jax.tree_util.tree_map(np.asarray, trunk)

    @jax.jit
    def _feats(x, p):
        taps = module.apply({"params": p}, x * 2.0 - 1.0)
        return jnp.mean(taps[layer], axis=(1, 2))

    def features(x):
        p = jax.tree_util.tree_map(jnp.asarray, params_np)
        return np.asarray(_feats(jnp.asarray(x), p))

    return features
