"""Multi-host seams (VERDICT r2 next #8): launch.py env/SLURM discovery and
engine.evaluate's cross-process allgather branch.

The discovery tests monkeypatch `jax.distributed.initialize` (initializing a
real cluster inside the test process would poison the CPU-mesh fixture); the
allgather test launches a REAL 2-process jax.distributed CPU cluster in
subprocesses and runs `engine.evaluate` in each.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from uvhand_tpu.train import launch


class _Capture:
    def __init__(self):
        self.calls = []

    def __call__(self, *a, **k):
        self.calls.append((a, k))


@pytest.fixture
def fake_init(monkeypatch):
    import jax

    cap = _Capture()
    monkeypatch.setattr(jax.distributed, "initialize", cap)
    return cap


def test_env_rank_discovery(fake_init, monkeypatch):
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.7")
    monkeypatch.setenv("MASTER_PORT", "4321")
    monkeypatch.setenv("WORLD_SIZE", "4")
    monkeypatch.setenv("RANK", "2")
    info = launch.init_multihost()
    assert fake_init.calls == [(("10.0.0.7:4321", 4, 2), {})]
    assert info["process_count"] == 1  # this process is still single-host


def test_slurm_discovery(fake_init, monkeypatch):
    monkeypatch.delenv("MASTER_ADDR", raising=False)
    monkeypatch.setenv("SLURM_PROCID", "3")
    monkeypatch.setenv("SLURM_NTASKS", "8")
    monkeypatch.setenv("SLURM_STEP_NODELIST", "node01,node02")
    info = launch.init_multihost()
    assert fake_init.calls == [(("node01:29500", 8, 3), {})]
    assert info["local_devices"] >= 1


def test_explicit_args(fake_init, monkeypatch):
    monkeypatch.delenv("MASTER_ADDR", raising=False)
    monkeypatch.delenv("SLURM_PROCID", raising=False)
    launch.init_multihost("host:1", 2, 1)
    assert fake_init.calls == [(("host:1", 2, 1), {})]


def test_single_host_noop(fake_init, monkeypatch):
    monkeypatch.delenv("MASTER_ADDR", raising=False)
    monkeypatch.delenv("SLURM_PROCID", raising=False)
    info = launch.init_multihost()
    # auto-discovery attempted with no args
    assert fake_init.calls == [((), {})]
    assert info["process_index"] == 0


_WORKER = textwrap.dedent("""
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    coord, rank = sys.argv[1], int(sys.argv[2])

    from uvhand_tpu.train import launch
    os.environ["MASTER_ADDR"], os.environ["MASTER_PORT"] = coord.split(":")
    os.environ["WORLD_SIZE"], os.environ["RANK"] = "2", str(rank)
    info = launch.init_multihost()
    assert info["process_count"] == 2, info

    # engine.evaluate: per-batch metrics differ per process; the allgather
    # branch (engine.py process_count > 1) must produce the GLOBAL mean on
    # every host.
    import jax.numpy as jnp
    from uvhand_tpu import engine

    def eval_step(params, batch):
        return {"m": jnp.full((2,), float(rank))}

    loader = [{"x": 0}] * 2
    scores = engine.evaluate(None, eval_step, loader)
    print(json.dumps({"rank": rank, "m": scores["m"], **info}))
""")


_TRAIN_WORKER = textwrap.dedent("""
    import json, os, sys, tempfile
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    coord, rank = sys.argv[1], int(sys.argv[2])

    from uvhand_tpu.train import launch
    os.environ["MASTER_ADDR"], os.environ["MASTER_PORT"] = coord.split(":")
    os.environ["WORLD_SIZE"], os.environ["RANK"] = "2", str(rank)
    info = launch.init_multihost()
    assert info["process_count"] == 2, info
    assert len(jax.devices()) == 4  # 2 local x 2 processes

    import numpy as np
    import jax.numpy as jnp
    from uvhand_tpu import engine
    from uvhand_tpu.data import arctic, loader
    from uvhand_tpu.geometry import mano, objects
    from uvhand_tpu.models.detr import UVHandDETR
    from uvhand_tpu.train import mesh as mesh_lib
    from uvhand_tpu.train.state import create_train_state

    root = tempfile.mkdtemp(prefix=f"uvhand_mh_{rank}_")
    bank = objects.synthetic_object_bank(2)
    mano_r, mano_l = mano.synthetic_mano(0, True), mano.synthetic_mano(1, False)
    arctic.make_synthetic_root(root, num_seqs=1, frames=4, views=1, seed=0,
                               obj_bank=bank)
    ds = arctic.ArcticDataset(root, "p1", "train",
                              kp3d_cano=np.asarray(bank.kp_bottom))
    batch = next(iter(loader.DataLoader(ds, 4, shuffle=False, seed=0)))

    model = UVHandDETR(num_queries=12, num_encoder_layers=1,
                       num_decoder_layers=2, d_model=64, dim_feedforward=128,
                       n_heads=4, dropout=0.0, feature_mask_ratio=0.0)
    mesh = mesh_lib.make_mesh(dp=4, mp=1)  # over the 4 GLOBAL devices
    batch = mesh_lib.shard_batch(mesh, {k: jnp.asarray(v) for k, v in batch.items()})
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                 jnp.zeros((1, 224, 224, 3)))
    state = create_train_state(model, params, lr=1e-3)
    state = mesh_lib.shard_state(mesh, state)

    step = engine.make_fused_train_step(model, mano_r, mano_l, bank)
    losses = []
    for i in range(2):
        state, ld = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(ld["total"]))
    print(json.dumps({"rank": rank, "losses": losses, **info}))
""")


@pytest.mark.slow
def test_two_process_cpu_cluster_fused_train_step(tmp_path):
    """The DDP-allreduce contract (util/misc.py:519-559) on the TRAIN path:
    the fused train step (grad psum across hosts inside jit's global-view
    partitioning) over a dp=4 mesh spanning 2 processes x 2 devices. Both
    ranks must observe the identical global loss trajectory, equal to a
    single-process dp=4 run on the same data."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    script = tmp_path / "train_worker.py"
    script.write_text(_TRAIN_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(r)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=1500)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}\n{err[-3000:]}"
        lines = [l for l in out.strip().splitlines() if l.startswith('{"')]
        outs.append(json.loads(lines[-1]))
    assert outs[0]["process_count"] == 2
    # both ranks see the identical GLOBAL loss (grad allreduce contract)
    np.testing.assert_allclose(outs[0]["losses"], outs[1]["losses"], rtol=0)

    # single-process oracle: same data, same seeds, dp=4 over local devices
    import tempfile

    import jax
    import jax.numpy as jnp

    from uvhand_tpu import engine
    from uvhand_tpu.data import arctic, loader
    from uvhand_tpu.geometry import mano, objects
    from uvhand_tpu.models.detr import UVHandDETR
    from uvhand_tpu.train import mesh as mesh_lib
    from uvhand_tpu.train.state import create_train_state

    root = tempfile.mkdtemp(prefix="uvhand_mh_ref_")
    bank = objects.synthetic_object_bank(2)
    mano_r, mano_l = mano.synthetic_mano(0, True), mano.synthetic_mano(1, False)
    arctic.make_synthetic_root(root, num_seqs=1, frames=4, views=1, seed=0,
                               obj_bank=bank)
    ds = arctic.ArcticDataset(root, "p1", "train",
                              kp3d_cano=np.asarray(bank.kp_bottom))
    batch = next(iter(loader.DataLoader(ds, 4, shuffle=False, seed=0)))
    model = UVHandDETR(num_queries=12, num_encoder_layers=1,
                       num_decoder_layers=2, d_model=64, dim_feedforward=128,
                       n_heads=4, dropout=0.0, feature_mask_ratio=0.0)
    mesh = mesh_lib.make_mesh(dp=4, mp=1, devices=jax.devices()[:4])
    batch = mesh_lib.shard_batch(mesh, {k: jnp.asarray(v) for k, v in batch.items()})
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                 jnp.zeros((1, 224, 224, 3)))
    state = mesh_lib.shard_state(mesh, create_train_state(model, params, lr=1e-3))
    step = engine.make_fused_train_step(model, mano_r, mano_l, bank)
    ref_losses = []
    for i in range(2):
        state, ld = step(state, batch, jax.random.PRNGKey(7))
        ref_losses.append(float(ld["total"]))
    # same global program on a different process layout: fp reorder only
    np.testing.assert_allclose(outs[0]["losses"], ref_losses, rtol=1e-4)


@pytest.mark.slow
def test_two_process_cpu_cluster_allgather(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(r)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        # generous: two fresh jax processes compiling on a shared (possibly
        # 1-core, possibly contended) CI host — observed >300 s under load
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        # Gloo teardown prints "[Gloo] Rank ..." to stdout and can race
        # AFTER the worker's json line — take the last JSON line, not the
        # last line
        lines = [l for l in out.strip().splitlines() if l.startswith('{"')]
        outs.append(json.loads(lines[-1]))
    for o in outs:
        assert o["process_count"] == 2
        # global mean over ranks {0, 1} on BOTH hosts
        np.testing.assert_allclose(o["m"], 0.5)
