"""Multi-host (DCN) utilities.

Replaces the reference's torchrun/NCCL host-side machinery (SURVEY.md §2.4):
`jax.distributed.initialize()` per host, one global Mesh over all chips, and
the helpers below for the two host-side exchanges the SG-RLVR loop needs —
assembling a global batch from per-host rows, and gathering reward/metric
scalars and python objects (completion strings) across hosts.

Single-host runs work unchanged: every helper degrades to the identity when
jax.process_count() == 1.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def initialize(**kwargs) -> None:
    """jax.distributed.initialize, tolerant of single-host runs.

    MUST be called before any JAX backend query (jax.devices(),
    jax.process_count(), the first jit...): querying the backend first
    initializes a local single-process runtime and silently defeats
    distributed init. This wrapper therefore never touches the backend
    before calling jax.distributed.initialize; it only swallows the
    "no cluster environment" error for plain single-host runs.
    """
    from jax._src.distributed import global_state

    if global_state.client is not None:
        return  # already initialized (idempotent)
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        if kwargs:
            # explicit cluster config must not silently degrade
            raise
        # bare initialize() with no cluster env detected: single-host run


def global_mesh(tp: int = 1, fsdp: int | None = None):
    """Mesh over ALL processes' devices (ICI within hosts, DCN across).

    fsdp caps the fsdp-axis size; remaining devices go to `data` (e.g.
    8 devices, fsdp=4 -> data=2) — a data axis > 1 is what lets rollout
    decode and the update batch shard across hosts (Sampler._rollout_spec,
    partition.batch_spec)."""
    from spacer_tpu.parallel.mesh import create_mesh, mesh_shape_for

    devices = jax.devices()
    shape = mesh_shape_for(len(devices), tp=tp, fsdp=fsdp)
    return create_mesh(shape, devices=devices)


def global_batch_from_local(local_batch: dict, mesh, batch_axes=("data", "fsdp")):
    """Per-host numpy batch -> global jax.Arrays sharded over the batch axes.

    Each host contributes its local rows; together they form the global
    batch (jax.make_array_from_process_local_data handles placement).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spacer_tpu.parallel.partition import _BATCH_DIM1_KEYS

    if jax.process_count() == 1:
        return local_batch

    total = int(np.prod([mesh.shape[a] for a in batch_axes]))
    nproc = jax.process_count()

    def place(k, x):
        x = np.asarray(x)
        # rope position arrays are (3, N, S): the batch dim is dim 1
        dim = 1 if k in _BATCH_DIM1_KEYS else 0
        if x.ndim > dim and (x.shape[dim] * nproc) % total == 0:
            spec = P(*([None] * dim), batch_axes)
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec), x
            )
        # batch dim too small to tile over the mesh axes (e.g. B prompt
        # rows < devices in the shared-prefix schema): exchange host-side
        # and replicate — the same fallback place_batch applies
        # single-process when a dim does not divide the axis product
        parts = all_gather_objects(x)
        full = np.concatenate(parts, axis=dim) if x.ndim > dim else parts[0]
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), full
        )

    return {k: place(k, v) for k, v in local_batch.items()}


def replicate_to_mesh(x, mesh):
    """IDENTICAL-on-every-host numpy -> fully-replicated global jax.Array.

    The multi-process analogue of jnp.asarray for SPMD inputs: every
    process holds the same host value (the caller's contract — assemble it
    with all_gather_objects first) and each local device reads its copy
    from the local host buffer.  Single-host, this is just device-put.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = np.asarray(x)
    return jax.make_array_from_callback(
        x.shape, NamedSharding(mesh, P()), lambda idx: x[idx]
    )


def place_global_batch(batch: dict, mesh, *, donate_unused=None):
    """IDENTICAL-on-every-host GLOBAL batch -> mesh placement.

    The multi-process analogue of place_batch (partition.py): every host
    holds the same full global batch (assembled via all_gather_objects);
    row-indexed arrays shard their batch dim over data x fsdp when
    divisible (each local device slices its shard out of the host copy),
    packed pixel patches and indivisible dims replicate.  Arrays that are
    already jax.Arrays pass through untouched.  Degrades to place_batch
    when jax.process_count() == 1 so callers can use it unconditionally.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spacer_tpu.parallel.partition import (
        _BATCH_DIM1_KEYS,
        _REPLICATED_KEYS,
        batch_spec,
        place_batch,
    )

    if jax.process_count() == 1:
        return place_batch(batch, mesh)
    baxes = batch_spec(mesh)[0]
    n_shards = int(np.prod([mesh.shape[a] for a in baxes]))
    out = {}
    for k, v in batch.items():
        if isinstance(v, jax.Array) and not isinstance(v, np.ndarray):
            out[k] = v
            continue
        v = np.asarray(v)
        dim = 1 if k in _BATCH_DIM1_KEYS else 0
        if (k in _REPLICATED_KEYS or v.ndim <= dim
                or v.shape[dim] % n_shards != 0):
            spec = P()
        else:
            spec = P(*([None] * dim), baxes)
        out[k] = jax.make_array_from_callback(
            v.shape, NamedSharding(mesh, spec), lambda idx, v=v: v[idx]
        )
    return out


import functools


@functools.lru_cache(maxsize=32)
def _replicate_reshard(sharding):
    """Jitted identity-reshard to a fully-replicated sharding, cached per
    target sharding so repeated rollout fetches reuse one compiled program
    (a fresh jit per call would retrace + recompile every step)."""
    return jax.jit(lambda a: a, out_shardings=sharding)


def fetch_to_host(arr, mesh) -> np.ndarray:
    """Global jax.Array -> identical full numpy array on every process.

    Rollout outputs (sampled tokens, acceptance telemetry) come back from
    the SPMD program with whatever output sharding the compiler chose; a
    non-addressable array cannot be np.asarray'd directly, so reshard to
    fully-replicated first (tokens are small: B*G x C int32).
    """
    if not isinstance(arr, jax.Array) or jax.process_count() == 1:
        return np.asarray(arr)
    if not arr.is_fully_replicated:
        from jax.sharding import NamedSharding, PartitionSpec as P

        arr = _replicate_reshard(NamedSharding(mesh, P()))(arr)
    return np.asarray(arr)


def all_gather_objects(obj: Any) -> list[Any]:
    """Gather an ARBITRARY python object from every host (reward strings,
    completion texts — the analogue of accelerate's gather_object,
    vllm_grpo_trainer_modified.py:546-547).

    multihost_utils only moves numeric arrays, so objects travel as pickled
    uint8 buffers: allgather the sizes, pad to the max, allgather, unpickle.
    """
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([data.size], np.int32)
    ).reshape(-1)
    buf = np.zeros((int(sizes.max()),), np.uint8)
    buf[: data.size] = data
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes())
        for i in range(jax.process_count())
    ]


def broadcast_from_host0(obj: Any) -> Any:
    """broadcast_object_list equivalent (vllm_grpo_trainer_modified.py:603)
    for arbitrary python objects (two-phase: size then pickled payload)."""
    if jax.process_count() == 1:
        return obj
    import pickle

    from jax.experimental import multihost_utils

    if jax.process_index() == 0:
        data = np.frombuffer(pickle.dumps(obj), np.uint8)
        size = np.asarray([data.size], np.int32)
    else:
        data = None
        size = np.zeros((1,), np.int32)
    size = np.asarray(multihost_utils.broadcast_one_to_all(size))
    buf = np.zeros((int(size[0]),), np.uint8)
    if jax.process_index() == 0:
        buf[:] = data
    buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return pickle.loads(buf.tobytes())


def mean_across_hosts(value: float) -> float:
    """Scalar metric mean (gather_for_metrics equivalent)."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray(value, np.float64))
    return float(np.mean(arr))
