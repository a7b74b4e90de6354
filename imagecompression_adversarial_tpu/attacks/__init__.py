from .common import RDAttackConfig, multistep_lr_schedule
from .evaluate import evaluate
from .rd import best_of_restarts, make_attack_fn, make_batch_attack_fn

__all__ = [
    "RDAttackConfig",
    "multistep_lr_schedule",
    "evaluate",
    "make_attack_fn",
    "make_batch_attack_fn",
    "best_of_restarts",
]
