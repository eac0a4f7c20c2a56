"""Production-scale sharding metadata: the REAL 7B shapes must shard cleanly
on an 8-device mesh (no silent fallback to replication) — checked via
eval_shape, nothing materialized."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from spacer_tpu.models.qwen25_vl import QWEN25_VL_7B, QWEN2_VL_7B, init_params
from spacer_tpu.parallel import create_mesh, partition_spec_tree
from spacer_tpu.parallel.partition import _shrink_spec_to_shape


def _check(cfg, mesh):
    shapes = jax.eval_shape(
        lambda k: init_params(k, cfg, jnp.bfloat16), jax.random.key(0)
    )
    specs = partition_spec_tree(shapes)

    flat_shapes = jax.tree_util.tree_leaves_with_path(shapes)
    flat_specs = jax.tree.leaves(specs)
    assert len(flat_shapes) == len(flat_specs)
    for (path, leaf), spec in zip(flat_shapes, flat_specs):
        kept = _shrink_spec_to_shape(spec, leaf.shape, mesh)
        # no sharded dim may be dropped for divisibility at 7B scale
        assert tuple(kept) == tuple(spec), (
            f"{jax.tree_util.keystr(path)}: {spec} -> {kept} "
            f"(shape {leaf.shape})"
        )
        # every big matrix must actually be sharded
        if leaf.ndim >= 2 and np.prod(leaf.shape) > 4_000_000:
            assert any(a is not None for a in tuple(spec)), (
                f"{jax.tree_util.keystr(path)} unsharded ({leaf.shape})"
            )


def test_7b_shapes_shard_on_8_devices():
    for shape in ({"data": 1, "fsdp": 8, "tp": 1},
                  {"data": 1, "fsdp": 4, "tp": 2},
                  {"data": 2, "fsdp": 2, "tp": 2}):
        mesh = create_mesh(shape)
        _check(QWEN25_VL_7B, mesh)
        _check(QWEN2_VL_7B, mesh)
