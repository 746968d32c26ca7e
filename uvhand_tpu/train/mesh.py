"""Device mesh + sharding helpers (dp x mp).

TPU-native replacement for the reference's torch DDP/NCCL stack
(`/root/reference/util/misc.py:519-559`, `tools/launch.py`): a
`jax.sharding.Mesh` with a data axis and an optional model (tensor) axis,
both over ICI (dp additionally spans DCN across slices). Gradient
all-reduce, the reference's `reduce_dict`, `num_boxes` all-reduce and metric
sync all fall out of jit's global-view partitioning — no explicit
collectives in user code.

Model parallelism goes beyond the reference (whole-model DDP replication):
large 2-D kernels (FFN / proposal-MLP matmuls) are sharded over `mp` on
their output dim; XLA inserts the all-gathers/reduce-scatters on the mp
axis. `shard_params` / `shard_state` apply the rule to a full train state
so optimizer moments shard identically to their params.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: kernels smaller than this stay replicated (all-gather cost beats the
#: memory/compute win for tiny weights)
MP_MIN_SIZE = 16384


def make_mesh(dp: int | None = None, mp: int = 1,
              devices=None) -> Mesh:
    """(dp, mp) mesh over the local devices.

    dp=None uses every device (dp = n_devices // mp). mp=1 degenerates to
    the pure data-parallel mesh. Device order: mp is the fastest-varying
    axis so model shards sit on adjacent chips (one ICI hop on a v5e tray);
    dp rides the remaining topology.
    """
    devs = np.array(jax.devices() if devices is None else devices)
    if dp is None:
        dp = len(devs) // mp
    assert dp * mp <= len(devs), (dp, mp, len(devs))
    return Mesh(devs[: dp * mp].reshape(dp, mp), axis_names=("dp", "mp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, x, min_size: int = MP_MIN_SIZE) -> NamedSharding:
    """Sharding rule for one param/optimizer-moment leaf.

    2-D kernels with >= min_size elements and an mp-divisible output dim
    shard over mp on the output dim (column parallelism: the following
    elementwise op is local, the next matmul triggers one collective);
    everything else replicates. With mp == 1 everything replicates — the
    DDP-equivalent layout.
    """
    mp = mesh.shape.get("mp", 1)
    if (
        mp > 1
        and hasattr(x, "ndim")
        and x.ndim == 2
        and x.shape[-1] % mp == 0
        and x.size >= min_size
    ):
        return NamedSharding(mesh, P(None, "mp"))
    return NamedSharding(mesh, P())


def param_sharding_for_path(mesh: Mesh, path, x,
                            min_size: int = MP_MIN_SIZE) -> NamedSharding:
    """Path-aware rule: backbone kernels stay REPLICATED regardless of
    shape. (a) That matches the reference's DDP layout (its backbone is
    never tensor-parallel), and (b) mp-sharding swin's window-attention
    GEMMs trips an XLA:TPU SPMD RET_CHECK (the all-reduce->reduce-scatter
    rewrite mis-handles the pad-to-window slice consumers; seen on the
    2026-08 toolchain via scripts/aot_multichip.py --backbone
    swin_L_384_22k --mp 2). The R50 flagship is unaffected either way
    (its convs are 4-D, outside the 2-D-kernel rule)."""
    if any(getattr(p, "key", None) == "backbone" for p in path):
        return replicated(mesh)
    return param_sharding(mesh, x, min_size)


def shard_params(mesh: Mesh, tree, min_size: int = MP_MIN_SIZE):
    """device_put every array leaf of a param/state pytree per the rule."""
    def leaf(path, x):
        if not hasattr(x, "ndim"):
            return x
        return jax.device_put(x, param_sharding_for_path(mesh, path, x, min_size))

    return jax.tree_util.tree_map_with_path(leaf, tree)


# optimizer state shards exactly like its params (the rule is shape-driven)
shard_state = shard_params


def shard_batch(mesh: Mesh, batch):
    """device_put a pytree with the batch axis sharded over dp."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
