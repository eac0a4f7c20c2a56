"""Host-memory offload: the TPU-native equivalent of DeepSpeed ZeRO-3 CPU
offload (reference local_scripts/zero3_offload.json: offload_optimizer +
offload_param to cpu).

On TPU, JAX exposes per-buffer memory kinds ("device" = HBM,
"pinned_host" = host DRAM reachable by DMA). Keeping the Adam moments in
pinned host memory between steps frees 2x(param bytes) of steady-state HBM —
exactly the headroom the rollout phase (KV caches) and long-context
activations need. The moments stream to HBM for the duration of the
optimizer update and back out afterwards, the same traffic pattern ZeRO
offload pays over PCIe.

Single-device CPU runs degrade gracefully (the CPU backend also exposes a
pinned_host space), so the path is testable without hardware.
"""

from __future__ import annotations

import jax


def _with_kind(x, kind: str):
    return jax.device_put(x, x.sharding.with_memory_kind(kind))


def offload_to_host(tree):
    """Move every array in the pytree to pinned host memory (keeping its
    device sharding layout, so a later to_device() restores placement)."""
    return jax.tree.map(lambda x: _with_kind(x, "pinned_host"), tree)


def to_device(tree):
    """Inverse of offload_to_host."""
    return jax.tree.map(lambda x: _with_kind(x, "device"), tree)


def is_on_host(tree) -> bool:
    leaves = jax.tree.leaves(tree)
    return bool(leaves) and all(
        x.sharding.memory_kind == "pinned_host" for x in leaves
    )
