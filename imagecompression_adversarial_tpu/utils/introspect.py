"""Per-layer introspection: activation capture and error propagation.

Functionality of the reference's diagnostics (`/root/reference/anchors/
utils.py:132-166` ``layer_store``/``layer_compare``, called from e.g.
`attack_ifgsm.py:255-256`): capture every submodule activation for an input
and report how an input perturbation grows layer by layer through the
codec.  Implemented with flax's ``capture_intermediates`` instead of forward
hooks.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def layer_activations(module, params, x, method=None) -> Dict[str, Any]:
    """Run a forward pass capturing every submodule output.

    Returns a flat {path: activation} dict ordered by path name.
    """
    kwargs = {}
    if method is not None:
        kwargs["method"] = method
    else:
        kwargs["quant_mode"] = "dequantize"
    _, state = module.apply(
        {"params": params}, x, capture_intermediates=True, mutable=["intermediates"],
        **kwargs,
    )

    flat: Dict[str, jax.Array] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(node, tuple):
            if len(node) == 1:
                walk(node[0], prefix)
            else:
                for i, v in enumerate(node):
                    walk(v, f"{prefix}[{i}]")
        else:
            flat[prefix] = node

    walk(state["intermediates"], "")
    return dict(sorted(flat.items()))


def layer_compare(module, params, x_a, x_b, method=None) -> List[Tuple[str, float, float]]:
    """Per-layer error propagation between two inputs.

    Returns [(layer_path, mean_abs_error, relative_error)] in layer order —
    the growth curve of an input perturbation through the network (ref
    `anchors/utils.py:152-166`).
    """
    acts_a = layer_activations(module, params, x_a, method=method)
    acts_b = layer_activations(module, params, x_b, method=method)
    rows = []
    for path in acts_a:
        a, b = acts_a[path], acts_b.get(path)
        if b is None or not hasattr(a, "shape") or a.shape != b.shape:
            continue
        if not jnp.issubdtype(a.dtype, jnp.floating):
            continue
        err = float(jnp.mean(jnp.abs(a - b)))
        denom = float(jnp.mean(jnp.abs(a))) + 1e-12
        rows.append((path, err, err / denom))
    return rows


def channel_maxima(y: jax.Array) -> np.ndarray:
    """Per-channel max |activation| of an NHWC latent — the quantity behind
    the reference's activation bar plots (``show_max_bar``,
    `attack_rd.py:150-205`)."""
    return np.asarray(jnp.max(jnp.abs(y), axis=(0, 1, 2)))


def show_max_bar(latents, labels, save_path: str, sort: bool = True) -> None:
    """Channel-wise max-activation bar chart for one or more latents
    (natural vs adversarial comparison plots)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 4))
    base = channel_maxima(latents[0])
    order = np.argsort(-base) if sort else np.arange(base.shape[0])
    width = 0.8 / len(latents)
    xs = np.arange(base.shape[0])
    for i, (y, label) in enumerate(zip(latents, labels)):
        vals = channel_maxima(y)[order]
        ax.bar(xs + i * width, vals, width=width, label=label)
    ax.set_xlabel("channel (sorted by natural max)" if sort else "channel")
    ax.set_ylabel("max |activation|")
    ax.legend()
    plt.tight_layout()
    plt.savefig(save_path, bbox_inches="tight")
    plt.close(fig)
