"""Cross-topology checkpoint restore: save under one mesh, resume under
another (the resume-after-resize path the reference never had — its ZeRO-3
checkpoints are tied to world size unless weights are gathered on save)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from spacer_tpu.models.qwen25_vl import init_params, tiny_config
from spacer_tpu.parallel import create_mesh, shard_params
from spacer_tpu.train.checkpoint import (
    load_model_only,
    restore_train_state,
    save_train_state,
)
from spacer_tpu.train.optimizer import make_optimizer


def _tree_equal(a, b):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_save_fsdp8_restore_other_topologies(tmp_path):
    cfg = tiny_config()
    mesh8 = create_mesh({"fsdp": 8})
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    params8, _ = shard_params(params, mesh8)
    tx = make_optimizer(learning_rate=1e-4, total_steps=10)
    opt8 = tx.init(params8)
    path = save_train_state(str(tmp_path / "ck"), params8, opt8,
                            {"global_step": 7})

    # restore onto a 2x2x2 mesh
    mesh222 = create_mesh({"data": 2, "fsdp": 2, "tp": 2})
    like_p, _ = shard_params(init_params(jax.random.key(1), cfg, jnp.float32),
                             mesh222)
    like_o = tx.init(like_p)
    p2, o2, meta = restore_train_state(path, like_p, like_o)
    assert meta["global_step"] == 7
    _tree_equal(p2, params8)
    # placement follows the TARGET topology
    leaf = p2["model"]["layers"]["self_attn"]["q_proj"]["kernel"]
    assert leaf.sharding.mesh.shape == {"data": 2, "fsdp": 2, "tp": 2}

    # restore onto a single device (host-gathered weights)
    dev0 = jax.devices()[0]
    like_single = jax.tree.map(
        lambda x: jax.device_put(np.zeros(x.shape, x.dtype), dev0), params
    )
    p1 = load_model_only(path, like_single)
    _tree_equal(p1, params8)
    assert jax.tree.leaves(p1)[0].sharding.device_set == {dev0}
