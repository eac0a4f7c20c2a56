"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Multi-chip TPU hardware is not available in CI; all sharding/collective tests
run against 8 virtual CPU devices, which exercises the same SPMD partitioner
paths XLA uses on a real ICI mesh.
"""

import os

# Must be set before `import jax` anywhere in the test process. Force (not
# setdefault): the driver environment pre-sets JAX_PLATFORMS=axon (TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
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
