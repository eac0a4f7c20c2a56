"""GRPO train step with sequence-parallel ring attention: metrics match the
single-program XLA step on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl import tiny_config, init_params
from spacer_tpu.parallel import create_mesh
from spacer_tpu.train import make_optimizer
from spacer_tpu.train.step import make_grpo_train_step


def _text_batch(cfg, G=8, P_len=64, C=16, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(10, cfg.text.vocab_size, size=(G, P_len + C))
    return {
        "input_ids": ids.astype(np.int32),
        "kv_mask": np.ones((G, P_len + C), bool),
        "position_ids": np.broadcast_to(
            np.arange(P_len + C)[None, None], (3, G, P_len + C)
        ).astype(np.int32),
        "completion_mask": np.ones((G, C), np.int32),
        "advantages": rng.normal(size=(G,)).astype(np.float32),
    }


def test_grpo_step_with_ring_attention():
    cfg = tiny_config()
    mesh = create_mesh({"data": 1, "fsdp": 8, "tp": 1})
    P_len, C, G = 64, 16, 8
    batch = _text_batch(cfg, G=G, P_len=P_len, C=C)

    def run(impl, seed=0):
        params = init_params(jax.random.key(seed), cfg, jnp.float32)
        ref = jax.tree.map(jnp.copy, params)
        tx = make_optimizer(learning_rate=1e-3, total_steps=10)
        opt = tx.init(params)
        step = make_grpo_train_step(
            cfg, tx, beta=0.04, remat=True, attn_impl=impl, logp_chunk=16,
        )
        p2, _, metrics = step(
            params, ref, opt, dict(batch), grid_thw=None,
            num_generations=G, prompt_len=P_len,
        )
        return p2, metrics

    with jax.default_matmul_precision("highest"):
        p_ring, m_ring = run(("ring", mesh, "fsdp"))
        p_xla, m_xla = run("xla")

    np.testing.assert_allclose(
        float(m_ring["loss"]), float(m_xla["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(float(m_ring["kl"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        float(m_ring["grad_norm"]), float(m_xla["grad_norm"]), rtol=1e-4
    )
    # updated params agree (Adam normalizes tiny grads to ~±lr, so float
    # noise in near-zero grads shows up at the 1e-5 scale — bound absolutely)
    for a, b in zip(jax.tree.leaves(p_ring), jax.tree.leaves(p_xla)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5
        )
