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
