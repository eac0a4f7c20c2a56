"""Pipeline parallelism (parallel/pipeline.py): forward parity with the
single-program lm_forward, gradient parity, and a GRPO-style train step
jitted over a pipe mesh axis.

The reference has no pipeline parallelism (SURVEY §2.3); these tests pin
the TPU-native GPipe implementation to the packed forward's numerics.
"""

import numpy as np
import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl import tiny_config, init_params
from spacer_tpu.models.qwen25_vl.language import lm_forward
from spacer_tpu.parallel import create_mesh
from spacer_tpu.parallel.pipeline import (
    pipeline_lm_forward,
    shard_layers_for_pipeline,
)


def _setup(B=4, T=24, layers=4, seed=0):
    import dataclasses

    cfg0 = tiny_config()
    cfg = dataclasses.replace(
        cfg0, text=dataclasses.replace(cfg0.text, num_layers=layers))
    params = init_params(jax.random.key(seed), cfg, jnp.float32)["model"]
    rng = np.random.default_rng(seed)
    ids = rng.integers(10, cfg.text.vocab_size, size=(B, T)).astype(np.int32)
    mask = np.ones((B, T), bool)
    mask[0, :3] = False  # left padding on one row
    pos = np.broadcast_to(np.arange(T)[None, None], (3, B, T)).astype(
        np.int32)
    return cfg, params, ids, mask, pos


def _pipe_mesh(pipe=4):
    devs = np.array(jax.devices()[:pipe]).reshape(pipe)
    return jax.sharding.Mesh(devs, ("pipe",))


def test_pipeline_forward_matches_lm_forward():
    cfg, params, ids, mask, pos = _setup()
    mesh = _pipe_mesh(4)
    params = shard_layers_for_pipeline(params, mesh)

    with jax.default_matmul_precision("highest"):
        want, _ = lm_forward(
            params, cfg.text, input_ids=jnp.asarray(ids),
            position_ids=jnp.asarray(pos), kv_mask=jnp.asarray(mask),
        )
        got = pipeline_lm_forward(
            params, cfg.text, mesh, num_microbatches=2,
            input_ids=jnp.asarray(ids), position_ids=jnp.asarray(pos),
            kv_mask=jnp.asarray(mask),
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_pipeline_single_stage_and_uneven_microbatches():
    """S=1 degenerates to the plain stack; M=B (fully unrolled pipeline)
    must also agree."""
    cfg, params, ids, mask, pos = _setup(B=4, T=16, layers=2)
    mesh = _pipe_mesh(2)
    params = shard_layers_for_pipeline(params, mesh)
    with jax.default_matmul_precision("highest"):
        want, _ = lm_forward(
            params, cfg.text, input_ids=jnp.asarray(ids),
            position_ids=jnp.asarray(pos), kv_mask=jnp.asarray(mask),
        )
        got = pipeline_lm_forward(
            params, cfg.text, mesh, num_microbatches=4,
            input_ids=jnp.asarray(ids), position_ids=jnp.asarray(pos),
            kv_mask=jnp.asarray(mask),
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_pipeline_train_step_grad_parity():
    """A GRPO-style loss differentiates through the pipeline: grads match
    the single-program forward's grads."""
    cfg, params, ids, mask, pos = _setup(B=4, T=16, layers=4)
    mesh = _pipe_mesh(4)
    params = shard_layers_for_pipeline(params, mesh)
    C = 6  # completion tokens
    rng = np.random.default_rng(3)
    adv = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))

    def grpo_loss(logits):
        # per-token logp of the realized ids on the completion span,
        # advantage-weighted (the pp analogue of train/grpo.py's core term)
        lp = jax.nn.log_softmax(logits[:, -C - 1:-1].astype(jnp.float32))
        tok = jnp.take_along_axis(
            lp, jnp.asarray(ids)[:, -C:, None], axis=-1)[..., 0]
        return -(adv[:, None] * tok).mean()

    def loss_pp(p):
        logits = pipeline_lm_forward(
            p, cfg.text, mesh, num_microbatches=2,
            input_ids=jnp.asarray(ids), position_ids=jnp.asarray(pos),
            kv_mask=jnp.asarray(mask),
        )
        return grpo_loss(logits)

    def loss_ref(p):
        logits, _ = lm_forward(
            p, cfg.text, input_ids=jnp.asarray(ids),
            position_ids=jnp.asarray(pos), kv_mask=jnp.asarray(mask),
        )
        return grpo_loss(logits)

    with jax.default_matmul_precision("highest"):
        l_pp, g_pp = jax.value_and_grad(loss_pp)(params)
        l_rf, g_rf = jax.value_and_grad(loss_ref)(params)

    np.testing.assert_allclose(float(l_pp), float(l_rf), rtol=1e-5)
    flat_pp = jax.tree.leaves(g_pp)
    flat_rf = jax.tree.leaves(g_rf)
    for a, b in zip(flat_pp, flat_rf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-4)


def test_pipeline_composes_with_data_parallel():
    """pp x dp on a 4x2 mesh: microbatch rows shard over `data`, logits
    still match the single-program forward."""
    cfg, params, ids, mask, pos = _setup(B=8, T=16, layers=4)
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = jax.sharding.Mesh(devs, ("pipe", "data"))
    params = shard_layers_for_pipeline(params, mesh)

    with jax.default_matmul_precision("highest"):
        want, _ = lm_forward(
            params, cfg.text, input_ids=jnp.asarray(ids),
            position_ids=jnp.asarray(pos), kv_mask=jnp.asarray(mask),
        )
        got = pipeline_lm_forward(
            params, cfg.text, mesh, num_microbatches=2, batch_axis="data",
            input_ids=jnp.asarray(ids), position_ids=jnp.asarray(pos),
            kv_mask=jnp.asarray(mask),
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_grpo_step_with_pipeline():
    """make_grpo_train_step(pipeline=(mesh, M)) — the full GRPO step
    (loss, KL, grads, update) through the pipelined forward matches the
    single-program step, packed schema (same contract as the ring/sp
    path, tests/test_ring_train_step.py)."""
    import optax

    from spacer_tpu.train.step import make_grpo_train_step

    cfg, params0, ids, mask, pos = _setup(B=8, T=24, layers=4)
    mesh = _pipe_mesh(4)
    P_len, C, G = 16, 8, 8
    rng = np.random.default_rng(7)
    batch = {
        "input_ids": ids,
        "kv_mask": np.asarray(mask),
        "position_ids": pos,
        "completion_mask": np.ones((8, C), np.int32),
        "advantages": rng.normal(size=(8,)).astype(np.float32),
    }

    def run(pipeline, seed=0):
        import dataclasses

        cfg_full = cfg  # Qwen25VLConfig with 4 layers
        from spacer_tpu.models.qwen25_vl import init_params

        params = init_params(jax.random.key(seed), cfg_full, jnp.float32)
        if pipeline is not None:
            params = dict(params)
            params["model"] = shard_layers_for_pipeline(
                params["model"], mesh)
        ref = jax.tree.map(jnp.copy, params)
        tx = optax.adamw(1e-3)
        opt = tx.init(params)
        step = make_grpo_train_step(
            cfg_full, tx, beta=0.04, remat=True, logp_chunk=8,
            pipeline=pipeline,
        )
        p2, _, metrics = step(
            params, ref, opt, dict(batch), grid_thw=None,
            num_generations=G, prompt_len=P_len,
        )
        return p2, metrics

    with jax.default_matmul_precision("highest"):
        p_pp, m_pp = run((mesh, 2))
        p_ref, m_ref = run(None)

    np.testing.assert_allclose(float(m_pp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_pp["kl"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        float(m_pp["grad_norm"]), float(m_ref["grad_norm"]), rtol=1e-4)
    # updated params agree absolutely: Adam normalizes tiny grads to ~±lr,
    # so f32 noise in near-zero grads surfaces at the 1e-4·lr scale (the
    # same bound the ring/sp step-parity test uses)
    for a, b in zip(jax.tree.leaves(p_pp), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_sft_step_with_pipeline():
    """make_sft_train_step(pipeline=...): loss parity with the
    single-program SFT step."""
    import optax

    from spacer_tpu.train.step import make_sft_train_step

    cfg, params0, ids, mask, pos = _setup(B=4, T=16, layers=4)
    mesh = _pipe_mesh(4)
    labels = np.where(np.asarray(mask), ids, -100).astype(np.int32)
    batch = {
        "input_ids": ids,
        "labels": labels,
        "kv_mask": np.asarray(mask),
        "position_ids": pos,
    }

    def run(pipeline):
        from spacer_tpu.models.qwen25_vl import init_params

        params = init_params(jax.random.key(0), cfg, jnp.float32)
        if pipeline is not None:
            params = dict(params)
            params["model"] = shard_layers_for_pipeline(
                params["model"], mesh)
        tx = optax.adamw(1e-3)
        opt = tx.init(params)
        step = make_sft_train_step(cfg, tx, logp_chunk=8, pipeline=pipeline)
        _, _, metrics = step(params, opt, dict(batch))
        return metrics

    with jax.default_matmul_precision("highest"):
        m_pp = run((mesh, 2))
        m_ref = run(None)
    np.testing.assert_allclose(float(m_pp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)


def test_pipeline_composes_with_optimizer_update():
    """One full pp train step: loss -> grads -> AdamW update, params move
    and stay sharded on the pipe axis."""
    import optax

    cfg, params, ids, mask, pos = _setup(B=4, T=16, layers=4)
    mesh = _pipe_mesh(4)
    params = shard_layers_for_pipeline(params, mesh)
    tx = optax.adamw(1e-3)
    opt = tx.init(params)

    def loss_fn(p):
        logits = pipeline_lm_forward(
            p, cfg.text, mesh, num_microbatches=2,
            input_ids=jnp.asarray(ids), position_ids=jnp.asarray(pos),
            kv_mask=jnp.asarray(mask),
        )
        return -jax.nn.log_softmax(
            logits.astype(jnp.float32))[..., 17].mean()

    before = np.asarray(
        jax.tree.leaves(params["layers"])[0], dtype=np.float32)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt = tx.update(grads, opt, params)
    params = optax.apply_updates(params, updates)
    assert np.isfinite(float(loss))
    after_leaf = jax.tree.leaves(params["layers"])[0]
    # layer params remain sharded over pipe after the update
    spec = after_leaf.sharding.spec
    assert spec[0] == "pipe", spec
    assert np.abs(np.asarray(after_leaf, np.float32) - before).max() > 0
