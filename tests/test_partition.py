"""Partition rules: expected specs per param, divisibility fallback."""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from spacer_tpu.models.qwen25_vl import tiny_config, init_params
from spacer_tpu.parallel import create_mesh, partition_spec_tree, shard_params


def test_partition_specs():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    specs = partition_spec_tree(params)
    sa = specs["model"]["layers"]["self_attn"]
    assert sa["q_proj"]["kernel"] == P(None, "fsdp", "tp")
    assert sa["o_proj"]["kernel"] == P(None, "tp", "fsdp")
    assert sa["q_proj"]["bias"] == P(None, "tp")
    assert specs["model"]["embed_tokens"]["embedding"] == P("tp", "fsdp")
    assert specs["model"]["lm_head"]["kernel"] == P("fsdp", "tp")
    assert specs["model"]["norm"]["scale"] == P()
    assert specs["visual"]["blocks"]["attn"]["qkv"]["kernel"] == P(None, "fsdp", "tp")


def test_shard_params_divisibility_fallback(cpu_devices):
    cfg = tiny_config()  # tiny dims: many axes not divisible by 8
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    mesh = create_mesh({"data": 1, "fsdp": 8, "tp": 1})
    sharded, specs = shard_params(params, mesh)
    # every leaf placed without error; embed vocab 1024 divides 1 (tp), fine
    for leaf in jax.tree.leaves(sharded):
        assert leaf.sharding is not None
    # hidden 64 is divisible by 8 -> fsdp kept on q_proj in-dim
    q_spec = specs["model"]["layers"]["self_attn"]["q_proj"]["kernel"]
    assert q_spec[1] == "fsdp"
