from .latent import (
    anomaly_score,
    clamp_feature_with_p,
    clamp_value_naive,
    load_range_profile,
)
from .self_ensemble import (
    bitdepth_reduction,
    dihedral_forward,
    dihedral_inverse_group,
    make_defend_fn,
    random_resize,
    self_ensemble,
)

__all__ = [
    "self_ensemble",
    "dihedral_forward",
    "dihedral_inverse_group",
    "bitdepth_reduction",
    "random_resize",
    "make_defend_fn",
    "clamp_value_naive",
    "clamp_feature_with_p",
    "anomaly_score",
    "load_range_profile",
]
