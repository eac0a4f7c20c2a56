"""On-chip probe: can XLA:TPU read int4 weights at decode shapes with the
convert fused (true 4-bit HBM traffic), like it does for int8?

Times y = x @ W.astype(bf16) in a fori_loop for W in {bf16, int8, int4}
at the rollout decode's dominant matmul shapes (M=64 rows).  Decode is
weight-bandwidth-bound, so if s4 is native the int4 time should be ~half
the int8 time; if XLA materializes an unpacked copy it will be equal or
slower.  Also checks numerics: int4 codes convert exactly.

Usage: python tools/microbench_int4.py [M] [K] [N] [steps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(M=64, K=2048, N=8192, steps=200):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32),
                     jnp.bfloat16)
    codes = rng.integers(-7, 8, size=(K, N)).astype(np.int8)

    weights = {
        "bf16": jnp.asarray(codes, jnp.bfloat16),
        "int8": jnp.asarray(codes, jnp.int8),
    }
    try:
        # host->device transfer of S4 trips the relay plugin; cast to int4
        # ON DEVICE instead (one jit), which is also what a quantize pass
        # would do in production
        weights["int4"] = jax.jit(lambda c: c.astype(jnp.int4))(
            weights["int8"])
        jax.block_until_ready(weights["int4"])
    except Exception as e:  # pragma: no cover - capability probe
        print(f"int4 dtype unavailable: {type(e).__name__}: {e}",
              flush=True)

    def loop(w):
        @jax.jit
        def run(x, w):
            def body(i, acc):
                y = jnp.dot((x + acc * 1e-30).astype(jnp.bfloat16),
                            w.astype(jnp.bfloat16))
                return acc + y.astype(jnp.float32).mean()

            return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

        return run

    base = None
    for name, w in weights.items():
        run = loop(w)
        out = float(run(x0, w))  # compile + numerics
        t0 = time.perf_counter()
        out2 = float(run(x0, w))
        dt = (time.perf_counter() - t0) / steps
        if base is None:
            base = out
        drift = abs(out2 - base) / max(abs(base), 1e-9)
        gbps = (K * N * {"bf16": 2, "int8": 1, "int4": 0.5}[name]
                ) / dt / 1e9
        print(f"{name}: {dt * 1e6:.1f} us/matmul  "
              f"eff_bw={gbps:.0f} GB/s  numerics_drift={drift:.2e}",
              flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:5]]
    main(*args)
