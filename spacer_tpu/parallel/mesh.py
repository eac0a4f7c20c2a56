"""Device mesh construction."""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "fsdp", "tp")


def mesh_shape_for(n_devices: int, tp: int = 1, fsdp: int | None = None
                   ) -> dict[str, int]:
    """Pick a (data, fsdp, tp) factorization of n_devices.

    Default: all non-tp devices go to fsdp (ZeRO-3-like: batch sharded over
    data*fsdp, params sharded over fsdp).
    """
    assert n_devices % tp == 0, (n_devices, tp)
    rest = n_devices // tp
    if fsdp is None:
        fsdp = rest
    assert rest % fsdp == 0, (rest, fsdp)
    return {"data": rest // fsdp, "fsdp": fsdp, "tp": tp}


def create_mesh(shape: dict[str, int] | None = None, devices=None, tp: int = 1
                ) -> Mesh:
    """Build a Mesh with axes (data, fsdp, tp).

    `shape` maps axis name -> size; missing axes get size 1. Total must equal
    the device count. With shape=None, uses mesh_shape_for(n, tp).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = mesh_shape_for(n, tp=tp)
    sizes = [shape.get(a, 1) for a in AXES]
    assert math.prod(sizes) == n, f"mesh {shape} != {n} devices"
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, AXES)
