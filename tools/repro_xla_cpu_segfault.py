"""Minimal-repro attempt for the XLA:CPU many-compiles segfault.

Background (Makefile test-all): running the FULL test suite in ONE pytest
process (~250 distinct XLA:CPU compiles on an 8-virtual-device mesh) has
been observed to segfault inside backend_compile near the end of the run,
while every test passes in isolation and in the two-process split.  This
script distills that workload: N distinct jitted programs (unique shapes
so nothing cache-hits), mixing plain, donated, and mesh-sharded programs
on 8 virtual CPU devices, in one process.

Usage:  python tools/repro_xla_cpu_segfault.py [n_programs]
Exit 0 = no crash at this count (prints peak RSS so state growth is
visible); a segfault reproduces the suite failure in ~40 lines for an
upstream report.

Observed result (2026-08-19, jax 0.9.0, 600 programs): NO crash in this
distilled form (peak RSS 2.01 GB after 600 compiles) — the crash needs
something the suite has and this script lacks (likely interleaved Mosaic
interpret-mode kernels and/or pytest's module churn).  The two-process
Makefile split therefore stays; this script is the starting point for
narrowing further.
"""

import os
import resource
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "false")

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def main(n=600):
    jax.config.update("jax_platforms", "cpu")
    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "fsdp"))
    for i in range(n):
        m = 8 + (i % 61)  # unique shapes -> unique compiles
        k = 16 + (i % 37)
        x = jnp.ones((m, k), jnp.float32)
        w = jnp.ones((k, m), jnp.float32)
        kind = i % 3
        if kind == 0:
            f = jax.jit(lambda x, w: jnp.tanh(x @ w).sum())
            f(x, w).block_until_ready()
        elif kind == 1:
            f = jax.jit(lambda x, w: (x @ w) * 2.0,
                        donate_argnums=(0,))
            f(x, w).block_until_ready()
        else:
            xs = jax.device_put(
                jnp.ones((8, k), jnp.float32),
                NamedSharding(mesh, P(("data", "fsdp"))))
            f = jax.jit(lambda a, w: jax.nn.relu(a @ w).sum() + m)
            f(xs, jnp.ones((k, 4), jnp.float32)).block_until_ready()
        if (i + 1) % 100 == 0:
            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            print(f"{i + 1} compiles, peak RSS {rss / 1e6:.2f} GB",
                  flush=True)
    print("no crash", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 600)
