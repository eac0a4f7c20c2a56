"""Multi-host (DCN) layer: a REAL 2-process jax.distributed run on CPU.

Spawns two subprocesses that initialize a jax.distributed cluster
(coordinator on localhost), each exposing 4 virtual CPU devices -> one
global 8-device mesh. Exercises the trainer's host-side exchanges:
global_batch_from_local placement, process_allgather of python objects,
broadcast_from_host0, mean_across_hosts, and an in-graph psum over the
global mesh. This is the capability the reference gets from torchrun+NCCL
(run_SpaceR_SG_RLVR.sh:9-13; gather_object/broadcast_object_list,
vllm_grpo_trainer_modified.py:546-603).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import os, sys, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"

    from spacer_tpu.parallel import multihost

    # MUST be the first jax call (the wrapper enforces init-before-backend)
    multihost.initialize(
        coordinator_address=sys.argv[1],
        num_processes=2,
        process_id=int(sys.argv[2]),
    )

    import jax
    # sitecustomize re-pins the platform regardless of env; config-level
    # update wins as long as no backend is initialized (conftest pattern)
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    rank = jax.process_index()
    mesh = multihost.global_mesh()

    # per-host rows -> global batch over the mesh
    local = {"x": np.full((4, 2), rank, np.float32)}
    g = multihost.global_batch_from_local(local, mesh)
    assert g["x"].shape == (8, 2), g["x"].shape

    @jax.jit
    def total(x):
        return x.sum()

    s = float(total(g["x"]))   # 4 rows of 0 + 4 rows of 1, 2 cols -> 8
    assert s == 8.0, s

    objs = multihost.all_gather_objects({"rank": rank, "msg": f"host{rank}"})
    assert [o["rank"] for o in objs] == [0, 1], objs

    b = multihost.broadcast_from_host0(np.asarray([41.0 + 1.0]))
    assert float(np.asarray(b)[0]) == 42.0

    m = multihost.mean_across_hosts(float(rank))
    assert m == 0.5, m

    print(f"WORKER_OK rank={rank}")
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    coord = f"localhost:{_free_port()}"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    env.get("PYTHONPATH", "")] if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
        assert f"WORKER_OK rank={i}" in out


def test_initialize_does_not_touch_backend_first():
    """Regression for the r1 bug: initialize() must not query the backend
    (jax.process_count()/jax.devices()) before jax.distributed.initialize —
    doing so boots a local runtime and silently defeats distributed init."""
    import ast
    import inspect

    from spacer_tpu.parallel import multihost

    tree = ast.parse(inspect.getsource(multihost.initialize))
    calls = [
        ast.unparse(n.func)
        for n in ast.walk(tree) if isinstance(n, ast.Call)
    ]
    backend_queries = [
        c for c in calls
        if c in ("jax.process_count", "jax.devices", "jax.local_devices",
                 "jax.device_count")
    ]
    assert not backend_queries, backend_queries
    assert "jax.distributed.initialize" in calls
