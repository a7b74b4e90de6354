"""Convert a torch LPIPS(alex) checkpoint into our LPIPS flax params.

The reference trains with the ``lpips`` package's AlexNet variant
(`/root/reference/train.py:47,92-94`); its full state_dict layout is

    scaling_layer.shift / scaling_layer.scale          (1, 3, 1, 1)
    net.slice1.0.{weight,bias}     conv0  (64, 3, 11, 11)   OIHW
    net.slice2.3.{weight,bias}     conv1  (192, 64, 5, 5)
    net.slice3.6.{weight,bias}     conv2  (384, 192, 3, 3)
    net.slice4.8.{weight,bias}     conv3  (256, 384, 3, 3)
    net.slice5.10.{weight,bias}    conv4  (256, 256, 3, 3)
    lin{0..4}.model.1.weight       heads  (1, C_l, 1, 1)

(slice indices keep torchvision's ``alexnet().features`` numbering; the
lin heads are Dropout+1x1-Conv Sequentials, hence ``.model.1``).  The
mapping here is a pure rename + OIHW->HWIO transpose, same policy as the
codec converter (`io/convert.py`); the scaling layer lands in the trunk's
``in_shift``/``in_scale`` params rather than being folded into conv0
(folding is inexact at zero-padded borders).

The zero-egress sandbox has no real checkpoint; `tests/test_lpips.py`
exercises this path with a FABRICATED state_dict and asserts parity
against a torch replica of the trunk+head (the parity_vs_compressai
--self-test trick, VERDICT r4 #8), so real weights drop in unchanged the
day egress exists.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# (torch conv prefix, flax conv name) in tap order
_CONV_KEYS = (
    ("net.slice1.0", "conv0"),
    ("net.slice2.3", "conv1"),
    ("net.slice3.6", "conv2"),
    ("net.slice4.8", "conv3"),
    ("net.slice5.10", "conv4"),
)


def _np(t) -> np.ndarray:
    # torch tensors (cpu) expose __array__; plain arrays pass through
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def lpips_params_from_torch(state: Dict, base_params: Dict = None) -> Dict:
    """lpips-package state_dict -> params pytree for `metrics.lpips.LPIPS`
    (use with `lpips_fn_from_params`).

    The distributed weight files (lpips/weights/v0.1/alex.pth) contain ONLY
    the lin heads — no trunk.  For those, pass ``base_params`` (an existing
    LPIPS pytree whose 'features' trunk supplies the convs, e.g. from
    converted torchvision AlexNet weights); without it, a lin-only state
    dict raises a descriptive error instead of a bare KeyError."""
    has_net = f"{_CONV_KEYS[0][0]}.weight" in state
    if not has_net and base_params is None:
        raise ValueError(
            "state_dict has no net.slice* conv weights (a lin-only "
            "checkpoint like lpips/weights/v0.1/alex.pth); pass "
            "base_params with a converted trunk to merge the heads into"
        )
    if has_net:
        features: Dict = {}
        for tk, fk in _CONV_KEYS:
            w = _np(state[f"{tk}.weight"])  # (O, I, kh, kw)
            b = _np(state[f"{tk}.bias"])
            features[fk] = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
        if "scaling_layer.shift" in state:
            features["in_shift"] = _np(state["scaling_layer.shift"]).reshape(-1)
            features["in_scale"] = _np(state["scaling_layer.scale"]).reshape(-1)
        else:
            features["in_shift"] = np.zeros(3, np.float32)
            features["in_scale"] = np.ones(3, np.float32)
    else:
        features = dict(base_params["features"])
    params: Dict = {"features": features}
    for i in range(5):
        params[f"lin{i}"] = _np(state[f"lin{i}.model.1.weight"]).reshape(-1)
    return params
