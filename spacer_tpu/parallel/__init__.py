"""SPMD parallelism: mesh construction and parameter partitioning.

Replaces the reference's torchrun + DeepSpeed ZeRO-3 + NCCL stack
(SURVEY.md section 2.4): one jax.sharding.Mesh over ICI (and DCN for
multi-slice), parameters sharded FSDP-style (allgather-on-use compiled in by
XLA SPMD), optional tensor parallelism over a 'tp' axis, batch data-parallel
over 'data' x 'fsdp'.
"""

from spacer_tpu.parallel.mesh import create_mesh, mesh_shape_for
from spacer_tpu.parallel.partition import (
    ARIA_PARTITION_RULES,
    QWEN_PARTITION_RULES,
    batch_spec,
    partition_spec_tree,
    place_batch,
    shard_params,
)
from spacer_tpu.parallel.pipeline import (
    pipeline_lm_forward,
    shard_layers_for_pipeline,
)

__all__ = [
    "create_mesh", "mesh_shape_for", "QWEN_PARTITION_RULES",
    "ARIA_PARTITION_RULES",
    "partition_spec_tree", "shard_params", "batch_spec", "place_batch",
    "pipeline_lm_forward", "shard_layers_for_pipeline",
]
