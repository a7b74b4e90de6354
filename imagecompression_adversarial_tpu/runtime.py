"""Model loading / saving harness (the reference's `coder.load_model`,
`/root/reference/coder.py:88-147`, minus the network zoo download).

Checkpoint formats:
  * ``.pth`` / ``.pth.tar``: CompressAI/reference torch checkpoints,
    converted through `io.convert` (handles the legacy ``net.`` prefix and
    ``{"state_dict": ...}`` containers).
  * ``.msgpack``: native flax serialized params (our own save format).
  * no checkpoint: randomly initialized params (``--new`` semantics; the
    sandbox has no model-zoo egress, so download-by-default is replaced by
    explicit checkpoints).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax

import flax.serialization

from .config import Config
from .io.convert import load_torch_checkpoint
from .models import init_model, init_params
from .models.codecs import CodecModel


def load_model(cfg: Config, seed: int = 0) -> Tuple[CodecModel, Dict[str, Any]]:
    """Build the codec module and its parameter tree per the config."""
    module = init_model(cfg.model, cfg.quality)
    params = init_params(module, jax.random.PRNGKey(seed))
    if cfg.checkpoint:
        ext = os.path.splitext(cfg.checkpoint)[1]
        if ext in (".pth", ".tar") or cfg.checkpoint.endswith(".pth.tar"):
            converted = load_torch_checkpoint(cfg.checkpoint, cfg.model)
            params = _merge_strict(params, converted, cfg.checkpoint)
        else:
            with open(cfg.checkpoint, "rb") as f:
                loaded = flax.serialization.from_bytes(params, f.read())
            # msgpack demo ckpts may be stored float16 (half the repo
            # footprint, ADVICE r2); compute always runs at the template
            # dtype
            import jax.numpy as jnp

            params = jax.tree_util.tree_map(
                lambda t, l: jnp.asarray(l, t.dtype), params, loaded
            )
    return module, params


def save_params(params: Dict[str, Any], path: str, dtype=None) -> None:
    """Serialize a parameter tree; ``dtype`` (e.g. ``jnp.float16``)
    downcasts for storage — `load_model` restores the model dtype."""
    if dtype is not None:
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), params
        )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(params))


def _merge_strict(template: Dict, loaded: Dict, name: str) -> Dict:
    """Validate that the converted tree exactly matches the template tree
    (same leaves, same shapes) and cast to the template dtypes."""
    import jax.numpy as jnp

    t_leaves = jax.tree_util.tree_leaves_with_path(template)
    l_paths = {
        jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(loaded)
    }
    t_paths = {jax.tree_util.keystr(p) for p, _ in t_leaves}
    missing = t_paths - l_paths
    unexpected = l_paths - t_paths
    if missing or unexpected:
        raise ValueError(
            f"checkpoint {name} does not match model: missing={sorted(missing)[:5]} "
            f"unexpected={sorted(unexpected)[:5]}"
        )

    def cast(t, l):
        if t.shape != l.shape:
            raise ValueError(f"shape mismatch in {name}: {t.shape} vs {l.shape}")
        return jnp.asarray(l, t.dtype)

    return jax.tree_util.tree_map(cast, template, loaded)
