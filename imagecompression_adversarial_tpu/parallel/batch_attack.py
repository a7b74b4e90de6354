"""Data-parallel corpus attack over a device mesh.

The multi-chip version of the batched attack (SURVEY §2.7 item 1): a batch
of images is sharded along the mesh's ``dp`` axis; every device runs the
full jitted attack scan on its shard; per-image metrics come back sharded
and are gathered on host.  No collectives are needed inside the attack
(images are independent) — XLA partitions the vmapped program cleanly.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..attacks.common import RDAttackConfig
from ..attacks.rd import make_attack_fn


def make_sharded_attack_fn(module, cfg: RDAttackConfig, mesh: Mesh):
    """Build (params, xs) -> batched results with xs sharded over 'dp'.

    ``xs`` leading dim must be a multiple of the dp axis size.
    """
    single = make_attack_fn(module, cfg)
    batch_sh = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    # xs: (B, H, W, 3); each vmap element becomes a single-image (1,H,W,3)
    batched = jax.jit(
        lambda params, xs, keys: jax.vmap(
            lambda x, k: single(params, x[None], k)
        )(xs, keys),
        in_shardings=(repl, batch_sh, batch_sh),
        out_shardings=batch_sh,
    )

    def attack(params, xs: np.ndarray, keys: Optional[jax.Array] = None) -> Dict:
        n_dp = mesh.shape["dp"]
        if keys is None:
            keys = jax.random.split(jax.random.PRNGKey(0), xs.shape[0])
        keys = np.asarray(keys)
        if xs.shape[0] % n_dp != 0:
            pad = n_dp - xs.shape[0] % n_dp
            xs = np.concatenate([xs, np.repeat(xs[-1:], pad, axis=0)])
            keys = np.concatenate([keys, np.repeat(keys[-1:], pad, axis=0)])
        else:
            pad = 0
        params_d = jax.device_put(params, repl)
        xs_d = jax.device_put(xs, batch_sh)
        keys_d = jax.device_put(keys, batch_sh)
        with mesh:
            out = batched(params_d, xs_d, keys_d)
        out = jax.tree_util.tree_map(np.asarray, out)
        if pad:
            out = jax.tree_util.tree_map(lambda a: a[: a.shape[0] - pad], out)
        return out

    return attack
