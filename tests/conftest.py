"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Multi-chip TPU hardware is not available in CI; all sharding/collective tests
run against 8 virtual CPU devices, which exercises the same SPMD partitioner
paths XLA uses on a real ICI mesh.
"""

import os

# Must be set before `import jax` anywhere in the test process. Force (not
# setdefault): the driver environment pre-sets JAX_PLATFORMS=axon (TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
# No persistent compilation cache on CPU: XLA:CPU AOT artifacts bake in the
# compiling host's instruction selection, and this image's shared cache can
# hold entries from a DIFFERENT machine — loading one silently miscomputes
# (observed: NaNs from a cached MoE binary; the loader warns about SIGILL).
# CPU compiles are fast; determinism matters more here.
os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"
# Single-threaded OpenMP: torch (libgomp) and XLA:CPU's oneDNN in one
# process race when both spin up OpenMP pools — observed as rare NaNs in
# XLA outputs of torch-parity tests.  The torch references here are tiny.
os.environ["OMP_NUM_THREADS"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers a TPU PJRT plugin at interpreter
# start and pins the platform regardless of env vars; the config-level update
# below wins as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# JAX's CPU backend (oneDNN) does reduced-precision f32 matmuls by default
# (~1e-3 error); parity tests need true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 virtual devices, got {len(devs)}"
    return devs
