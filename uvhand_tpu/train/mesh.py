"""Device mesh + sharding helpers.

TPU-native replacement for the reference's torch DDP/NCCL stack
(`/root/reference/util/misc.py:519-559`, `tools/launch.py`): a single
`jax.sharding.Mesh` with a data axis over ICI (and DCN across slices).
Gradient all-reduce, the reference's `reduce_dict`, `num_boxes` all-reduce
and metric sync all fall out of jit's global-view partitioning — no explicit
collectives in user code.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, axis_names=("dp",)) -> Mesh:
    """Data-parallel mesh over all local devices (or the first `dp`)."""
    devices = np.array(jax.devices() if dp is None else jax.devices()[:dp])
    return Mesh(devices.reshape(-1), axis_names=axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """device_put a pytree with the batch axis sharded over dp."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
