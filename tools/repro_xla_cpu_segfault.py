"""Minimal repro hunt for the XLA:CPU segfault that forces Makefile's
two-process `test-all` split.

Symptom (observed since round 3): one pytest process running the FULL
suite (~250 distinct XLA:CPU compiles on the 8-virtual-device mesh)
segfaults inside `backend_compile` near the END of the run; every test
passes in isolation and the suite passes when split into two processes
(Makefile `test-all`).  Hypothesis: per-process compiler-state
accumulation (LLVM context / thunk registry growth), not any specific
program.

This script tries to reproduce WITHOUT pytest: it compiles a stream of
distinct programs (shape- and structure-varied, single-device and
8-device-sharded) in one process until it crashes or reaches --n.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/repro_xla_cpu_segfault.py --n 600

Record of runs (jax/jaxlib 0.9.0, linux, 8 virtual CPU devices):
  2026-08-20, n=600 structure-varied compiles (scan/while/grad/sharded
  mix, 2.4x the suite's ~250): COMPLETED WITHOUT CRASH, RSS flat at
  226-228 MB from compile 50 through 600 — no per-compile state growth
  at this program size.  This RULES OUT raw compile count and steady
  compiler-state accumulation as the trigger.  Remaining suspects, in
  likelihood order: (a) compile-memory spikes from the suite's LARGE
  programs (value_and_grad over 12-layer multimodal models — several GB
  per compile) landing on a heap already fragmented by ~200 earlier
  compiles + live fixtures (the suite peaks >5 GB RSS); (b) pytest
  keeping every test module's jitted executables alive (no eviction),
  so late compiles run with hundreds of live LLVM-jitted code regions.
  Both are bounded by the Makefile's two-process split, which stays —
  now as a characterized mitigation rather than a mystery.
"""

import argparse
import os
import resource
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=600)
    ap.add_argument("--log-every", type=int, default=50)
    args = ap.parse_args()

    # Same dance as tests/conftest.py: the image's sitecustomize registers
    # the axon TPU plugin at interpreter start and pins the platform, so a
    # config-level update (before any backend init) is required — env vars
    # alone do not stick.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    mesh = Mesh(np.array(devs).reshape(2, 4), ("data", "fsdp"))
    print(f"devices={len(devs)} jax={jax.__version__}", flush=True)

    def make_program(i):
        """A structurally distinct program per i: varying shapes, a scan,
        a while_loop, a grad, and (every 4th) a sharded compile — the mix
        the test suite generates."""
        d = 8 * (1 + i % 17)
        s = 16 * (1 + i % 7)

        if i % 4 == 3:
            spec = NamedSharding(mesh, P("data", None))

            @jax.jit
            def f(x, w):
                return jnp.einsum("bd,dk->bk", x, w).sum()

            x = jax.device_put(np.ones((8, d), np.float32), spec)
            w = np.ones((d, s), np.float32)
            return lambda: f(x, w)

        if i % 4 == 0:
            @jax.jit
            def f(x):
                def body(c, t):
                    return c * 1.0001 + t.sum(), c
                c, ys = jax.lax.scan(body, 0.0, x)
                return c + ys.sum()

            x = np.ones((4, d, s), np.float32)
            return lambda: f(x)

        if i % 4 == 1:
            @jax.jit
            def f(x):
                def cond(v):
                    return v[0] < 10

                def body(v):
                    return (v[0] + 1, v[1] @ v[1].T)

                return jax.lax.while_loop(cond, body, (0, x))[1].sum()

            x = np.eye(d, dtype=np.float32)
            return lambda: f(x)

        @jax.jit
        def f(w, x):
            def loss(w):
                return jnp.tanh(x @ w).sum()

            return jax.grad(loss)(w).sum()

        w = np.ones((d, s), np.float32)
        x = np.ones((3, d), np.float32)
        return lambda: f(w, x)

    for i in range(args.n):
        fn = make_program(i)
        float(np.asarray(fn()))  # compile + execute + fetch
        if (i + 1) % args.log_every == 0:
            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
            print(f"compile {i + 1}/{args.n} rss={rss}MB", flush=True)

    print("COMPLETED without crash", flush=True)


if __name__ == "__main__":
    main()
