"""Device-mesh helpers: the green-field parallelism layer (SURVEY §2.7).

The reference is strictly single-GPU (its only DataParallel hook is
commented out, `/root/reference/train.py:262`).  Here scaling is expressed
with `jax.sharding`: a 1-D (or 2-D) logical mesh, batch axes sharded along
``dp``, parameters replicated; XLA inserts the psum/all-gather collectives
over ICI.  The same annotations drive the vmapped batch attack, adversarial
training, and the eval sweeps.

Axes:
  dp — data parallel over images/batches (the natural axis for this
       workload: the largest codec fits on one chip many times over, so
       TP/PP are not warranted — recorded in SURVEY §2.7).
  sp — spatial tiling axis reserved for megapixel inputs (halo'd conv
       sharding); size 1 until needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("dp",)
) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devs = np.array(devices[:n_devices])
    if len(axis_names) == 1:
        return Mesh(devs, axis_names)
    # trailing axes get size 1
    shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    return Mesh(devs.reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading batch dimension along the dp axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "dp"):
    """Device-put a host batch with its leading axis sharded."""
    return jax.device_put(batch, batch_sharding(mesh, axis))


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated."""
    return jax.device_put(tree, replicated(mesh))
