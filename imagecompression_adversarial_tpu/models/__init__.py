from .codecs import (
    Cheng2020Anchor,
    CodecModel,
    DebugCodec,
    FactorizedPrior,
    JointAutoregressive,
    ScaleHyperprior,
)
from .layers import (
    Conv,
    Deconv,
    GDN,
    MaskedConv,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    SubpelConv,
    pixel_shuffle,
)
from .registry import (
    ARCHITECTURES,
    init_model,
    init_params,
    model_dims,
    quality_range,
)

__all__ = [
    "CodecModel",
    "FactorizedPrior",
    "ScaleHyperprior",
    "JointAutoregressive",
    "Cheng2020Anchor",
    "DebugCodec",
    "Conv",
    "Deconv",
    "GDN",
    "MaskedConv",
    "SubpelConv",
    "ResidualBlock",
    "ResidualBlockWithStride",
    "ResidualBlockUpsample",
    "pixel_shuffle",
    "ARCHITECTURES",
    "init_model",
    "init_params",
    "model_dims",
    "quality_range",
]
