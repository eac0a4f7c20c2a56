"""Optimizer-state host offload (ZeRO-3 CPU-offload equivalent)."""

import numpy as np
import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl import init_params, tiny_config
from spacer_tpu.parallel import create_mesh, shard_params
from spacer_tpu.parallel.offload import is_on_host, offload_to_host, to_device
from spacer_tpu.train.optimizer import make_optimizer


def test_offload_roundtrip_preserves_values_and_layout():
    cfg = tiny_config()
    mesh = create_mesh({"fsdp": 8})
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    params, _ = shard_params(params, mesh)
    tx = make_optimizer(learning_rate=1e-4, total_steps=10)
    opt = tx.init(params)

    host = offload_to_host(opt)
    assert is_on_host(host)
    back = to_device(host)
    assert not is_on_host(back)
    for a, b in zip(jax.tree.leaves(opt), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        if hasattr(a.sharding, "spec"):  # scalar leaves are single-device
            assert b.sharding.spec == a.sharding.spec  # layout survives
        assert b.sharding.device_set == a.sharding.device_set


def test_update_with_host_resident_state_matches_device():
    """The trainer offload protocol (H2D before the update, D2H after) must
    produce the same numbers as the all-HBM step."""
    import optax

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    params = jax.device_put(params, jax.devices()[0])
    tx = make_optimizer(learning_rate=1e-3, total_steps=10)
    opt = tx.init(params)
    grads = jax.tree.map(lambda x: jnp.ones_like(x) * 0.01, params)

    @jax.jit
    def step(params, opt, grads):
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt

    p_dev, o_dev = step(params, opt, grads)
    # the trainer's offload protocol: H2D before the update, D2H after
    p_host, o_host = step(params, to_device(offload_to_host(opt)), grads)
    o_host = offload_to_host(o_host)
    assert is_on_host(o_host)
    o_host = to_device(o_host)
    for a, b in zip(jax.tree.leaves(p_dev), jax.tree.leaves(p_host)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(o_dev), jax.tree.leaves(o_host)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
