"""Sequence-parallel LM forward: lm_forward with ring attention over the
mesh matches the single-program XLA forward (values + grads)."""

import numpy as np
import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl import tiny_config, init_params
from spacer_tpu.models.qwen25_vl.language import lm_forward
from spacer_tpu.parallel import create_mesh


def test_lm_forward_ring_matches_xla():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    mesh = create_mesh({"data": 1, "fsdp": 8, "tp": 1})
    rng = np.random.default_rng(0)
    B, S = 2, 32  # S divisible by 8 shards
    ids = rng.integers(10, cfg.text.vocab_size, size=(B, S))

    ref, _ = lm_forward(
        params["model"], cfg.text, input_ids=jnp.asarray(ids),
        causal=True, attn_impl="xla",
    )
    ring_impl = ("ring", mesh, "fsdp")
    out, _ = jax.jit(
        lambda p, i: lm_forward(
            p["model"], cfg.text, input_ids=i, causal=True,
            attn_impl=ring_impl,
        )
    )(params, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_lm_forward_ring_gradients():
    cfg = tiny_config()
    params = init_params(jax.random.key(1), cfg, jnp.float32)
    mesh = create_mesh({"data": 1, "fsdp": 8, "tp": 1})
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(10, cfg.text.vocab_size, size=(1, 16)))

    def loss(p, impl):
        out, _ = lm_forward(p["model"], cfg.text, input_ids=ids,
                            causal=True, attn_impl=impl)
        return jnp.sum(jnp.tanh(out / 10.0))

    g_ref = jax.grad(lambda p: loss(p, "xla"))(params)
    g_ring = jax.jit(
        jax.grad(lambda p: loss(p, ("ring", mesh, "fsdp")))
    )(params)
    for a, b in zip(jax.tree.leaves(g_ring), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
        )
