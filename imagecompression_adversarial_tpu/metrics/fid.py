"""Distribution-level perceptual metrics: FID, KID (polynomial-kernel MMD),
Inception Score — feature-extractor-agnostic.

Functionality of the reference's standalone suite
(`/root/reference/utils/metrics_compare/mmd.py:56-369`), which computes
KID/FID/IS over Inception or LeNet features.  That code downloads a TF1
Inception graph at runtime; this rebuild separates the *metric math* (exact,
tested against closed forms) from the *feature extractor*, which is any
``images -> (N, D) / logits`` callable — the zero-egress sandbox supplies a
small conv feature net; a pretrained extractor can be plugged in unchanged.
"""

from __future__ import annotations

from typing import Callable, Iterable, Tuple

import numpy as np
from scipy import linalg


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """FID between two feature sets: ||mu_a - mu_b||^2 +
    Tr(Ca + Cb - 2 sqrt(Ca Cb))."""
    if feats_a.shape[0] < 2 or feats_b.shape[0] < 2:
        # np.cov silently squeezes an (1, D) input into a one-variable
        # series, producing a wrong (not just degenerate) covariance
        raise ValueError("FID needs >= 2 samples in each set")
    mu_a, mu_b = feats_a.mean(0), feats_b.mean(0)
    cov_a = np.cov(feats_a, rowvar=False)
    cov_b = np.cov(feats_b, rowvar=False)
    covmean = linalg.sqrtm(cov_a @ cov_b)
    if isinstance(covmean, tuple):  # older scipy returned (sqrtm, errest)
        covmean = covmean[0]
    if not np.all(np.isfinite(covmean)):
        # rank-deficient covariances (N-1 < D): the standard eps*I jitter
        # used by the original FID implementation
        eps = 1e-6 * np.eye(cov_a.shape[0])
        covmean = linalg.sqrtm((cov_a + eps) @ (cov_b + eps))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    diff = mu_a - mu_b
    return float(diff @ diff + np.trace(cov_a + cov_b - 2.0 * covmean))


def _poly_kernel(x: np.ndarray, y: np.ndarray, degree=3, gamma=None, coef0=1.0):
    if gamma is None:
        gamma = 1.0 / x.shape[1]
    return (gamma * (x @ y.T) + coef0) ** degree


def kid(
    feats_a: np.ndarray,
    feats_b: np.ndarray,
    n_subsets: int = 10,
    subset_size: int = 100,
    seed: int = 0,
    degree: int = 3,
    gamma: float | None = None,
    coef0: float = 1.0,
) -> Tuple[float, float]:
    """Kernel Inception Distance: unbiased polynomial-kernel MMD^2, averaged
    over random subsets (mean, std).  Kernel knobs mirror the reference CLI
    (`/root/reference/utils/metrics_compare/mmd.py:406-408`
    --mmd-degree/--mmd-gamma/--mmd-coef0)."""
    rng = np.random.RandomState(seed)
    m = min(subset_size, feats_a.shape[0], feats_b.shape[0])
    vals = []
    for _ in range(n_subsets):
        xa = feats_a[rng.choice(feats_a.shape[0], m, replace=False)]
        xb = feats_b[rng.choice(feats_b.shape[0], m, replace=False)]
        k_aa = _poly_kernel(xa, xa, degree, gamma, coef0)
        k_bb = _poly_kernel(xb, xb, degree, gamma, coef0)
        k_ab = _poly_kernel(xa, xb, degree, gamma, coef0)
        np.fill_diagonal(k_aa, 0)
        np.fill_diagonal(k_bb, 0)
        mmd2 = (
            k_aa.sum() / (m * (m - 1))
            + k_bb.sum() / (m * (m - 1))
            - 2.0 * k_ab.mean()
        )
        vals.append(mmd2)
    return float(np.mean(vals)), float(np.std(vals))


def inception_score(
    probs: np.ndarray, n_splits: int = 10
) -> Tuple[float, float]:
    """IS from class probabilities (N, K): exp(E_x KL(p(y|x) || p(y)))."""
    scores = []
    n = probs.shape[0]
    for chunk in np.array_split(probs, n_splits):
        py = chunk.mean(0, keepdims=True)
        kl = chunk * (np.log(chunk + 1e-12) - np.log(py + 1e-12))
        scores.append(np.exp(kl.sum(1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


def make_conv_feature_fn(dim: int = 64, seed: int = 0) -> Callable:
    """Deterministic random-conv feature extractor (sandbox default): three
    strided 3x3 convs + global pooling -> (N, dim) features.  Random conv
    features are a standard proxy when no pretrained net is available."""
    import jax
    import jax.numpy as jnp

    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    widths = [16, 32, dim]
    kernels = []
    in_ch = 3
    for k, w in zip(keys, widths):
        kernels.append(
            jax.random.normal(k, (3, 3, in_ch, w)) / np.sqrt(9 * in_ch)
        )
        in_ch = w

    @jax.jit
    def features(x):
        h = x
        for kern in kernels:
            dn = jax.lax.conv_dimension_numbers(
                h.shape, kern.shape, ("NHWC", "HWIO", "NHWC")
            )
            h = jax.lax.conv_general_dilated(
                h, kern, (2, 2), "SAME", dimension_numbers=dn
            )
            h = jax.nn.relu(h)
        return jnp.mean(h, axis=(1, 2))

    return lambda x: np.asarray(features(jnp.asarray(x)))


def features_over(images: Iterable[np.ndarray], feature_fn: Callable) -> np.ndarray:
    return np.concatenate([feature_fn(im) for im in images], axis=0)
