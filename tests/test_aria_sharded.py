"""Aria MoE under SPMD: expert-parallel dispatch, partition rules, and a
GRPO train step on the 8-virtual-device mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from spacer_tpu.models.aria.config import tiny_aria_config
from spacer_tpu.models.aria.language import (
    init_lm_params,
    lm_forward,
    positions_1d_to_3d,
)
from spacer_tpu.ops.moe import init_moe_params, moe_mlp, moe_mlp_ep
from spacer_tpu.parallel import (
    ARIA_PARTITION_RULES,
    create_mesh,
    shard_params,
)


def test_ep_matches_dropless_with_ample_capacity():
    params = init_moe_params(jax.random.key(0), 32, 16, 8, 2)
    x = jax.random.normal(jax.random.key(1), (4, 9, 32))
    ref = moe_mlp(params, x, topk=3, impl="ragged")
    got = moe_mlp_ep(params, x, topk=3, capacity_factor=8.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_ep_drops_overflow_tokens():
    """With capacity ~0, routed-expert outputs drop to zero; the shared
    experts still contribute."""
    from spacer_tpu.ops.moe import shared_expert_mlp

    params = init_moe_params(jax.random.key(0), 16, 8, 4, 1)
    x = jax.random.normal(jax.random.key(2), (1, 64, 16))
    # capacity_factor tiny -> floor of 8 slots per expert, 64*2 assignments:
    # some must drop; with factor covering all, none drop.
    full = moe_mlp_ep(params, x, topk=2, capacity_factor=64.0)
    tiny = moe_mlp_ep(params, x, topk=2, capacity_factor=0.01)
    shared = shared_expert_mlp(params["shared"], x.reshape(-1, 16)).reshape(x.shape)
    # dropped rows fall back to exactly the shared-expert output
    diff_full = np.abs(np.asarray(full - shared)).max()
    assert diff_full > 0
    # tiny capacity keeps at most 8 slots/expert; outputs differ from full
    assert np.abs(np.asarray(tiny - full)).max() > 0


def test_sharded_forward_matches_single_device(cpu_devices):
    cfg = tiny_aria_config()
    params = init_lm_params(jax.random.key(0), cfg.text)
    ids = np.random.RandomState(0).randint(
        10, cfg.text.vocab_size, size=(8, 12))
    pos = positions_1d_to_3d(jnp.asarray(np.arange(12)[None].repeat(8, 0)))

    ref, _ = lm_forward(params, cfg.text, input_ids=jnp.asarray(ids),
                        position_ids=pos)

    mesh = create_mesh({"data": 1, "fsdp": 8, "tp": 1})
    wrapped, specs = shard_params({"model": params}, mesh,
                                  ARIA_PARTITION_RULES)
    sharded = wrapped["model"]

    # expert weights must actually shard over fsdp (E axis) at real shapes;
    # tiny E=8 divides 8.
    fc1_spec = specs["model"]["layers"]["mlp"]["experts"]["fc1"]["kernel"]
    assert tuple(fc1_spec) == (None, "fsdp", None, "tp")

    with jax.sharding.set_mesh(mesh):
        got, _ = jax.jit(
            lambda p, i: lm_forward(p, cfg.text, input_ids=i,
                                    position_ids=pos)
        )(sharded, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_sharded_forward_ep_impl(cpu_devices):
    """moe_impl='ep' under the mesh: logits match the dropless reference
    when capacity is ample."""
    cfg0 = tiny_aria_config()
    cfg_ep = dataclasses.replace(
        cfg0, text=dataclasses.replace(
            cfg0.text, moe_impl="ep", moe_capacity_factor=8.0)
    )
    params = init_lm_params(jax.random.key(0), cfg0.text)
    ids = np.random.RandomState(1).randint(
        10, cfg0.text.vocab_size, size=(8, 10))
    pos = positions_1d_to_3d(jnp.asarray(np.arange(10)[None].repeat(8, 0)))

    ref, _ = lm_forward(params, cfg0.text, input_ids=jnp.asarray(ids),
                        position_ids=pos)

    mesh = create_mesh({"data": 1, "fsdp": 8, "tp": 1})
    sharded = shard_params({"model": params}, mesh,
                           ARIA_PARTITION_RULES)[0]["model"]
    with jax.sharding.set_mesh(mesh):
        got, _ = jax.jit(
            lambda p, i: lm_forward(p, cfg_ep.text, input_ids=i,
                                    position_ids=pos)
        )(sharded, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("moe_impl", ["ragged", "ep"])
def test_aria_grpo_step_on_mesh(cpu_devices, moe_impl):
    """Text-only GRPO step with the Aria family on a 2x2x2 mesh: loss
    finite, params update, expert grads flow."""
    from spacer_tpu.models.aria.model import init_params
    from spacer_tpu.parallel.partition import place_batch
    from spacer_tpu.train.step import make_grpo_train_step

    cfg0 = tiny_aria_config()
    cfg = dataclasses.replace(
        cfg0, text=dataclasses.replace(
            cfg0.text, moe_impl=moe_impl, moe_capacity_factor=8.0)
    )
    key = jax.random.key(0)
    params = init_params(key, cfg)
    ref_params = jax.tree.map(jnp.copy, params)

    mesh = create_mesh({"data": 2, "fsdp": 2, "tp": 2})
    params, _ = shard_params(params, mesh, ARIA_PARTITION_RULES)
    ref_params, _ = shard_params(ref_params, mesh, ARIA_PARTITION_RULES)

    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    opt_state = jax.device_put(opt_state)

    N, P, C = 8, 6, 5
    rng = np.random.RandomState(0)
    ids = rng.randint(10, cfg.text.vocab_size, size=(N, P + C))
    pos1d = np.arange(P + C)[None].repeat(N, 0)
    batch = {
        "input_ids": ids.astype(np.int32),
        "kv_mask": np.ones((N, P + C), np.int32),
        "position_ids": np.broadcast_to(pos1d[None], (3, N, P + C)).astype(np.int32),
        "completion_mask": np.ones((N, C), np.int32),
        "advantages": rng.randn(N).astype(np.float32),
    }

    step = make_grpo_train_step(cfg, tx, beta=0.04, prompt_len=P, remat=True)
    fc1_before = np.asarray(
        params["model"]["layers"]["mlp"]["experts"]["fc1"]["kernel"],
        dtype=np.float32,
    )  # snapshot: step() donates params
    with jax.sharding.set_mesh(mesh):
        placed = place_batch(batch, mesh)
        new_params, opt_state, metrics = step(
            params, ref_params, opt_state, placed, None, 1, P
        )
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    # expert weights actually moved
    delta = np.abs(np.asarray(
        new_params["model"]["layers"]["mlp"]["experts"]["fc1"]["kernel"],
        dtype=np.float32,
    ) - fc1_before).max()
    assert delta > 0
