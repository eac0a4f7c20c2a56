"""Debugging aids (SURVEY.md §5: the reference has no sanitizers; these are
the TPU-build equivalents of its DEBUG_MODE + defensive-fallback culture).
"""

from __future__ import annotations

import contextlib


def enable_nan_checks(on: bool = True) -> None:
    """Trap NaNs at the XLA boundary (jax_debug_nans): any op producing a
    NaN raises with the offending jaxpr — the closest thing to a numerics
    sanitizer for compiled SPMD programs."""
    import jax

    jax.config.update("jax_debug_nans", on)


def enable_determinism() -> None:
    """Bit-reproducible runs: deterministic XLA reductions + fixed PRNG
    implementation. Costs performance; use for debugging divergence."""
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_gpu_deterministic_ops" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_tpu_spmd_rng_bit_generator_unsafe=false"
        ).strip()


@contextlib.contextmanager
def interpret_kernels():
    """Run all Pallas kernels in interpreter mode (slow, exact semantics) —
    for isolating kernel miscompiles from algorithm bugs."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


@contextlib.contextmanager
def disabled_jit():
    """Eager execution for step-through debugging of model code."""
    import jax

    with jax.disable_jit():
        yield
