"""Model factory: name + quality -> codec module.

Mirrors the reference factory `init_model`
(`/root/reference/anchors/model.py:60-78`) and the CompressAI zoo's
quality -> channel-width tables.  Pretrained weights are loaded through the
PyTorch->JAX converter in `io.convert` (no network access here).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax

from .codecs import (
    Cheng2020Anchor,
    CodecModel,
    DebugCodec,
    FactorizedPrior,
    JointAutoregressive,
    ScaleHyperprior,
)

ARCHITECTURES = (
    "factorized", "hyper", "context", "cheng2020", "cheng2020-attn", "debug",
    "cheng2020-gmm", "invcompress", "hific", "tic", "nlaic", "fic",
)

# Quality -> (N, M) tables (CompressAI zoo configuration).
_FACTORIZED_CFG = {q: (128, 192) if q <= 5 else (192, 320) for q in range(1, 9)}
_HYPER_CFG = dict(_FACTORIZED_CFG)
_CONTEXT_CFG = {q: (192, 192) if q <= 4 else (192, 320) for q in range(1, 9)}
_CHENG_CFG = {q: (128, 128) if q <= 3 else (192, 192) for q in range(1, 7)}


def quality_range(model: str) -> Tuple[int, int]:
    """Valid quality range per family (ref sweep caps, `attack_rd.py:712-715`)."""
    return (1, 6) if model.startswith("cheng2020") else (1, 8)


def model_dims(model: str, quality: int) -> Tuple[int, int]:
    try:
        if model == "factorized":
            return _FACTORIZED_CFG[quality]
        if model == "hyper":
            return _HYPER_CFG[quality]
        if model == "context":
            return _CONTEXT_CFG[quality]
        if model in ("cheng2020", "cheng2020-attn", "cheng2020-gmm"):
            return _CHENG_CFG[quality]
        if model == "debug":
            return (3, 192)
        if model == "invcompress":
            return (192, 768)
        if model == "hific":
            return (220, 220)
        if model == "tic":
            return (128, 192)
        if model == "nlaic":
            return _CONTEXT_CFG[quality]
        if model == "fic":
            # Image_coding(3, 32, 192, 42, 64) widths (ref attack_fic.py:148)
            return (192, 192)
    except KeyError:
        raise ValueError(f"quality {quality} out of range for model {model!r}")
    raise ValueError(f"'{model}' not in {ARCHITECTURES} for param '-m'")


def init_model(model: str, quality: int) -> CodecModel:
    """Construct an (uninitialized) codec module."""
    n, m = model_dims(model, quality)
    if model == "factorized":
        return FactorizedPrior(N=n, M=m)
    if model == "hyper":
        return ScaleHyperprior(N=n, M=m)
    if model == "context":
        return JointAutoregressive(N=n, M=m)
    if model == "cheng2020":
        return Cheng2020Anchor(N=n, M=m)
    if model == "cheng2020-attn":
        from .codecs import Cheng2020Attention

        return Cheng2020Attention(N=n, M=m)
    if model == "cheng2020-gmm":
        from .codecs import Cheng2020AttnGMM

        return Cheng2020AttnGMM(N=n, M=m, ep_final_width=9 * n)
    if model == "debug":
        return DebugCodec(N=n, M=m)
    if model == "invcompress":
        from .invcompress import InvCompress

        return InvCompress(N=n, M=m)
    if model == "hific":
        from .hific import HiFiC

        return HiFiC(N=n, M=m)
    if model == "tic":
        from .tic import TIC

        return TIC(N=n, M=m)
    if model == "nlaic":
        from .nlaic import NLAIC

        return NLAIC(N=n, M=m)
    if model == "fic":
        from .fic import FIC

        return FIC(N=n, M=m)
    raise ValueError(f"'{model}' not in {ARCHITECTURES} for param '-m'")


def init_params(
    module: CodecModel, key: jax.Array, input_shape=(1, 64, 64, 3)
) -> Dict:
    """Initialize a parameter pytree with a dummy forward."""
    import jax.numpy as jnp

    k_param, k_quant = jax.random.split(key)
    x = jnp.zeros(input_shape, jnp.float32)
    variables = module.init(
        {"params": k_param, "quant": k_quant}, x, quant_mode="noise"
    )
    return variables["params"]
