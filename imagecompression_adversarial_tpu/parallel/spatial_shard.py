"""True spatial model-parallelism: one image's rows sharded across chips.

`parallel/spatial.py` scales megapixel inputs by overlap-tiling + feathered
blending — an approximation (tile seams) that the reference also lives with
(`/root/reference/coder.py:32-34` block coding).  This module is the exact
TPU-native alternative: annotate the H dimension of the activations with a
mesh axis (``sp``) and let XLA's SPMD partitioner compile every conv /
deconv / GDN in the codec into per-shard compute plus halo exchanges
(collective-permutes of the kernel-overlap rows) over ICI.

No manual halo code: `lax.conv_general_dilated` under GSPMD with a sharded
spatial operand *is* the halo-exchange kernel (the scaling-book recipe —
pick a mesh, annotate shardings, let XLA insert collectives).  The result
is bit-identical in structure to the single-device forward (no feathering,
no seams) while activation memory and FLOPs per chip drop by the sp-axis
size: a 12-megapixel attack that cannot fit one chip's HBM runs sharded 4×.

Works for the whole attack scan, not just the forward: the noise variable,
Adam moments, and every intermediate inherit the row sharding from the
input annotation, so the 1001-step `lax.scan` runs fully partitioned with
only the loss reductions (psum) and conv halos crossing chips.

Constraints: H must be divisible by (sp × 64) so every stride-2 stage keeps
whole rows per shard (pad-to-64 upstream guarantees the 64; pick sp
accordingly).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..attacks.common import RDAttackConfig
from ..attacks.rd import make_attack_fn


def row_sharding(mesh: Mesh, axis: str = "sp") -> NamedSharding:
    """NHWC activations with H split along the ``sp`` mesh axis."""
    return NamedSharding(mesh, P(None, axis, None, None))


def make_spatial_forward(module, mesh: Mesh, axis: str = "sp"):
    """Jitted reconstruction forward with the image rows sharded.

    Returns (params, x) -> result dict; ``x_hat`` comes back row-sharded
    (convert with np.asarray to gather on host).
    """
    xsh = row_sharding(mesh, axis)
    repl = NamedSharding(mesh, P())

    fwd = jax.jit(
        lambda params, x: module.apply(
            {"params": params}, x, quant_mode="dequantize"
        ),
        in_shardings=(repl, xsh),
    )

    def forward(params, x) -> Dict:
        n_sp = mesh.shape[axis]
        assert x.shape[1] % (n_sp * 64) == 0, (
            f"H={x.shape[1]} must divide by sp*64={n_sp * 64} "
            "(pad-to-64 upstream, then pick sp)"
        )
        with mesh:
            return fwd(jax.device_put(params, repl), jax.device_put(x, xsh))

    return forward


def make_spatial_attack_fn(
    module, cfg: RDAttackConfig, mesh: Mesh, axis: str = "sp"
):
    """RD attack with ONE image's rows sharded over the ``sp`` axis.

    Complements `parallel/batch_attack.py` (many images over ``dp``): here a
    single oversized image is partitioned, so the full 1001-step scan —
    noise, Adam state, activations — lives sharded; XLA inserts conv halos
    and loss psums.  Exact same numerics as the single-chip attack.
    """
    single = make_attack_fn(module, cfg)
    xsh = row_sharding(mesh, axis)
    repl = NamedSharding(mesh, P())

    def attack(params, x, key: Optional[jax.Array] = None) -> Dict:
        n_sp = mesh.shape[axis]
        assert x.shape[1] % (n_sp * 64) == 0, (
            f"H={x.shape[1]} must divide by sp*64={n_sp * 64}"
        )
        params_d = jax.device_put(params, repl)
        x_d = jax.device_put(x, xsh)
        with mesh:
            if key is None:
                return single(params_d, x_d)
            return single(params_d, x_d, jax.device_put(key, repl))

    return attack
