from .factorized import EntropyBottleneck
from .gaussian import (
    SCALE_BOUND,
    default_scale_table,
    gaussian_conditional,
    gaussian_likelihood,
)

__all__ = [
    "EntropyBottleneck",
    "gaussian_conditional",
    "gaussian_likelihood",
    "default_scale_table",
    "SCALE_BOUND",
]
