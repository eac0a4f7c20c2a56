"""LoRA: zero-init no-op, merge math, and the adapter-only GRPO step."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl import tiny_config, init_params
from spacer_tpu.train.lora import (
    LoraConfig,
    init_lora_params,
    make_lora_grpo_train_step,
    merge_lora,
)
from spacer_tpu.train import make_optimizer
from tests.test_train_step import _make_batch


def test_lora_zero_init_is_identity():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    lcfg = LoraConfig(r=4)
    lora = init_lora_params(jax.random.key(1), params, lcfg)
    merged = merge_lora(params, lora, lcfg)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, merged)
    assert max(jax.tree.leaves(diffs)) == 0.0
    # adapters exist exactly at the q/k/v/o kernels
    n_adapters = len(jax.tree.leaves(lora)) // 2
    assert n_adapters == 4  # stacked q,k,v,o


def test_lora_merge_math():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    lcfg = LoraConfig(r=2, alpha=4)
    lora = init_lora_params(jax.random.key(1), params, lcfg)
    # set b nonzero on q_proj
    qp = lora["model"]["layers"]["self_attn"]["q_proj"]["kernel"]
    qp["b"] = jnp.ones_like(qp["b"]) * 0.01
    merged = merge_lora(params, lora, lcfg)
    base_k = params["model"]["layers"]["self_attn"]["q_proj"]["kernel"]
    merged_k = merged["model"]["layers"]["self_attn"]["q_proj"]["kernel"]
    expected = base_k + 2.0 * jnp.einsum("lir,lro->lio", qp["a"], qp["b"])
    np.testing.assert_allclose(np.asarray(merged_k), np.asarray(expected),
                               rtol=1e-6)
    # untouched elsewhere
    np.testing.assert_array_equal(
        np.asarray(merged["model"]["layers"]["mlp"]["gate_proj"]["kernel"]),
        np.asarray(params["model"]["layers"]["mlp"]["gate_proj"]["kernel"]),
    )


def test_lora_grpo_step():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    lcfg = LoraConfig(r=4)
    lora = init_lora_params(jax.random.key(1), params, lcfg)
    tx = make_optimizer(learning_rate=1e-3, total_steps=10)
    opt_state = tx.init(lora)
    step = make_lora_grpo_train_step(
        cfg, tx, lcfg, beta=0.04, remat=False, attn_impl="xla", logp_chunk=8,
    )
    P_len, C, G = 64, 16, 8
    batch, grid = _make_batch(cfg, B=1, G=G, P_len=P_len, C=C)
    # copy before the step: lora buffers are donated
    qp0 = jax.tree.map(
        np.asarray, lora["model"]["layers"]["self_attn"]["q_proj"]["kernel"]
    )
    with jax.default_matmul_precision("highest"):
        lora2, opt_state, metrics = step(
            params, lora, opt_state, batch, grid_thw=grid,
            num_generations=G, prompt_len=P_len,
        )
    # step 0: adapters are a no-op -> policy == ref -> kl == 0,
    # loss = -mean of masked-mean advantages
    adv, m = batch["advantages"], batch["completion_mask"]
    expected = -np.mean((adv[:, None] * m).sum(1) / m.sum(1))
    np.testing.assert_allclose(float(metrics["loss"]), expected, rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(float(metrics["kl"]), 0.0, atol=1e-6)
    # only b moves at the first step (a has zero grad through zero b? no:
    # dL/da = g @ b^T = 0 since b == 0 -> a unchanged; b gets gradient)
    qp1 = lora2["model"]["layers"]["self_attn"]["q_proj"]["kernel"]
    assert float(jnp.abs(qp1["b"] - qp0["b"]).max()) > 0
    # a has zero loss-gradient through zero b; only AdamW weight decay
    # (lr * wd = 1e-5 relative) touches it
    np.testing.assert_allclose(np.asarray(qp1["a"]), np.asarray(qp0["a"]),
                               rtol=2e-5)
