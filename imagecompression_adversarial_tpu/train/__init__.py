from .checkpoint import CheckpointManager, ckpt_dir_for
from .loss import (
    LAMBDA_MSE,
    LAMBDA_MSSSIM,
    lambda_for,
    rate_distortion_loss,
    recompression_loss,
)
from .step import (
    ReduceLROnPlateau,
    TrainState,
    create_train_state,
    make_optimizers,
    quantile_labels,
)

__all__ = [
    "rate_distortion_loss",
    "recompression_loss",
    "lambda_for",
    "LAMBDA_MSE",
    "LAMBDA_MSSSIM",
    "TrainState",
    "create_train_state",
    "make_optimizers",
    "quantile_labels",
    "ReduceLROnPlateau",
    "CheckpointManager",
    "ckpt_dir_for",
]
