"""Multi-host initialization.

TPU-native replacement for the reference's launchers
(`/root/reference/tools/launch.py` torch.distributed.launch clone,
`run_dist_launch.sh`, `run_dist_slurm.sh`, `util/misc.py:519
init_distributed_mode`): a single call to `jax.distributed.initialize` with
env/SLURM discovery. On TPU pods, JAX auto-discovers the topology; the env
variables mirror the reference's MASTER_ADDR/RANK surface for DCN clusters.
"""

from __future__ import annotations

import os


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> dict:
    """Initialize multi-host JAX. Returns topology info.

    Resolution order (mirrors util/misc.py:519-559):
      1. explicit args,
      2. env RANK/WORLD_SIZE/MASTER_ADDR/MASTER_PORT,
      3. SLURM_PROCID/SLURM_NTASKS + SLURM_STEP_NODELIST,
      4. single-host TPU auto-discovery (no-op initialize).
    """
    import jax

    if coordinator is None and "MASTER_ADDR" in os.environ:
        coordinator = f"{os.environ['MASTER_ADDR']}:{os.environ.get('MASTER_PORT', '1234')}"
        num_processes = int(os.environ.get("WORLD_SIZE", 1))
        process_id = int(os.environ.get("RANK", 0))
    elif coordinator is None and "SLURM_PROCID" in os.environ:
        node = os.environ["SLURM_STEP_NODELIST"].split(",")[0].replace("[", "")
        coordinator = f"{node}:29500"
        num_processes = int(os.environ["SLURM_NTASKS"])
        process_id = int(os.environ["SLURM_PROCID"])

    if coordinator is not None and num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)
    else:
        try:
            jax.distributed.initialize()  # TPU pod auto-discovery
        except Exception:
            pass  # single host

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0
