"""End-to-end GRPO / SFT train-step tests on an 8-device CPU mesh.

This exercises the same SPMD partitioner paths as a real ICI mesh: params
sharded FSDP/TP by the partition rules, batch sharded over data x fsdp, one
jitted step doing vision encode + policy/ref logps + loss + optax update.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from spacer_tpu.models.qwen25_vl import (
    tiny_config,
    init_params,
    get_rope_index,
)
from spacer_tpu.parallel import create_mesh, shard_params, batch_spec
from spacer_tpu.train import make_optimizer
from spacer_tpu.train.step import make_grpo_train_step, make_sft_train_step


def _make_batch(cfg, B=1, G=8, P_len=64, C=16, seed=0):
    rng = np.random.default_rng(seed)
    grid = ((2, 8, 8),)
    n_video = (2 * 8 * 8) // 4
    prompt = (
        [10, 11, cfg.vision_start_token_id]
        + [cfg.video_token_id] * n_video
        + [cfg.vision_end_token_id, 20, 21]
    )
    pad = P_len - len(prompt)
    ids_row = [cfg.pad_token_id] * pad + prompt
    mask_row = [0] * pad + [1] * len(prompt)
    prompt_ids = np.array([ids_row] * B)
    prompt_mask = np.array([mask_row] * B)
    pos, deltas = get_rope_index(
        cfg, prompt_ids, video_grid_thw=np.array(grid),
        attention_mask=prompt_mask,
    )
    completion = rng.integers(10, cfg.text.vocab_size, size=(B * G, C))
    full_ids = np.concatenate(
        [np.repeat(prompt_ids, G, axis=0), completion], axis=1
    )
    comp_mask = np.ones((B * G, C), np.int32)
    comp_mask[:, C - 2 :] = rng.integers(0, 2, size=(B * G, 2))
    comp_mask[:, 0] = 1
    kv_mask = np.concatenate(
        [np.repeat(prompt_mask, G, axis=0), comp_mask], axis=1
    ).astype(bool)
    # positions: completion token t at delta + P_len + t
    comp_pos = (
        deltas.reshape(-1, 1) + P_len + np.arange(C)[None, :]
    )
    comp_pos = np.repeat(comp_pos, G, axis=0)
    pos_full = np.concatenate(
        [np.repeat(pos, G, axis=1), np.broadcast_to(comp_pos[None], (3, B * G, C))],
        axis=2,
    )
    pixels = rng.normal(size=(2 * 8 * 8, cfg.vision.patch_dim)).astype(np.float32)
    advantages = rng.normal(size=(B * G,)).astype(np.float32)
    return {
        "input_ids": full_ids.astype(np.int32),
        "kv_mask": kv_mask,
        "position_ids": pos_full.astype(np.int32),
        "completion_mask": comp_mask,
        "advantages": advantages,
        "pixel_values": pixels,
    }, grid


@pytest.mark.parametrize("mesh_shape", [
    {"data": 1, "fsdp": 8, "tp": 1},
    {"data": 2, "fsdp": 2, "tp": 2},
])
def test_grpo_step_sharded(mesh_shape):
    cfg = tiny_config()
    mesh = create_mesh(mesh_shape)
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    params, specs = shard_params(params, mesh)
    ref_params = jax.tree.map(jnp.copy, params)  # distinct buffers: params are donated

    tx = make_optimizer(learning_rate=1e-3, total_steps=100)
    opt_state = tx.init(params)

    P_len, C, G = 64, 16, 8
    batch, grid = _make_batch(cfg, B=1, G=G, P_len=P_len, C=C)
    bspec = batch_spec(mesh)
    sharded_batch = {
        k: jax.device_put(
            v,
            NamedSharding(mesh, P() if k == "pixel_values" else bspec
                          if np.ndim(v) and np.asarray(v).shape[0] == G else P()),
        )
        for k, v in batch.items()
    }
    # position_ids leading dim is 3 (axes), shard dim 1
    sharded_batch["position_ids"] = jax.device_put(
        batch["position_ids"], NamedSharding(mesh, P(None, ("data", "fsdp")))
    )

    step = make_grpo_train_step(
        cfg, tx, beta=0.04, prompt_len=P_len, remat=True, attn_impl="xla",
        logp_chunk=8,
    )
    with jax.default_matmul_precision("highest"):
        params2, opt_state, metrics = step(
            params, ref_params, opt_state, sharded_batch,
            grid_thw=grid, num_generations=G,
        )
    loss = float(metrics["loss"])
    kl = float(metrics["kl"])
    assert np.isfinite(loss)
    # at step 0 policy == ref -> KL exactly 0, ratio 1 -> loss = -mean(adv)
    adv = batch["advantages"]
    m = batch["completion_mask"]
    expected = -np.mean((adv[:, None] * m).sum(1) / m.sum(1))
    np.testing.assert_allclose(loss, expected, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(kl, 0.0, atol=1e-5)
    # params actually moved
    delta = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), params2, ref_params
    )
    assert max(jax.tree.leaves(delta)) > 0


def test_sft_step():
    cfg = tiny_config()
    mesh = create_mesh({"data": 1, "fsdp": 8, "tp": 1})
    params = init_params(jax.random.key(1), cfg, jnp.float32)
    params, _ = shard_params(params, mesh)
    tx = make_optimizer(learning_rate=1e-3, total_steps=100)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    S = 32
    ids = rng.integers(10, cfg.text.vocab_size, size=(8, S)).astype(np.int32)
    labels = ids.copy()
    labels[:, :5] = -100
    kv_mask = np.ones((8, S), bool)
    pos = np.broadcast_to(np.arange(S)[None, None], (3, 8, S)).astype(np.int32)
    batch = {
        "input_ids": ids, "labels": labels, "kv_mask": kv_mask,
        "position_ids": pos,
    }
    step = make_sft_train_step(cfg, tx, remat=False, attn_impl="xla",
                               logp_chunk=8)
    with jax.default_matmul_precision("highest"):
        params2, opt_state, metrics = step(params, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) > 0
    # a couple more steps should reduce loss on this fixed batch
    losses = [float(metrics["loss"])]
    for _ in range(3):
        params2, opt_state, metrics = step(params2, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def _two_group_batches(cfg, G=4, P_len=64, C=16, seed=1):
    """Same data in both schemas: packed (N, P+C) and shared-prefix."""
    B = 2
    rng = np.random.default_rng(seed)
    grid1 = (2, 8, 8)
    n_patches = 2 * 8 * 8
    n_video = n_patches // 4
    prompt_rows, mask_rows = [], []
    for b in range(B):
        prompt = (
            [10 + b, 11, cfg.vision_start_token_id]
            + [cfg.video_token_id] * n_video
            + [cfg.vision_end_token_id, 20 + b, 21]
        )
        pad = P_len - len(prompt)
        prompt_rows.append([cfg.pad_token_id] * pad + prompt)
        mask_rows.append([0] * pad + [1] * len(prompt))
    prompt_ids = np.array(prompt_rows, np.int32)
    prompt_mask = np.array(mask_rows, np.int32)
    grid = (grid1, grid1)
    pos, deltas = get_rope_index(
        cfg, prompt_ids, video_grid_thw=np.array(grid),
        attention_mask=prompt_mask,
    )
    completion = rng.integers(
        10, cfg.text.vocab_size, size=(B * G, C)).astype(np.int32)
    comp_mask = np.ones((B * G, C), np.int32)
    comp_mask[:, C - 3:] = rng.integers(0, 2, size=(B * G, 3))
    comp_mask[:, 0] = 1
    comp_pos = np.repeat(
        deltas.reshape(-1, 1) + P_len + np.arange(C)[None, :], G, axis=0)
    pixels = rng.normal(size=(B * n_patches, cfg.vision.patch_dim)).astype(
        np.float32)
    advantages = rng.normal(size=(B * G,)).astype(np.float32)

    packed = {
        "input_ids": np.concatenate(
            [np.repeat(prompt_ids, G, axis=0), completion], axis=1),
        "kv_mask": np.concatenate(
            [np.repeat(prompt_mask, G, axis=0), comp_mask], axis=1
        ).astype(bool),
        "position_ids": np.concatenate(
            [np.repeat(pos, G, axis=1),
             np.broadcast_to(comp_pos[None], (3, B * G, C))], axis=2
        ).astype(np.int32),
        "completion_mask": comp_mask,
        "advantages": advantages,
        "pixel_values": pixels,
    }
    shared = {
        "prompt_ids": prompt_ids,
        "prompt_mask": prompt_mask,
        "prompt_position_ids": np.asarray(pos, np.int32),
        "completion_ids": completion,
        "completion_position_ids": np.broadcast_to(
            comp_pos[None], (3, B * G, C)).astype(np.int32),
        "completion_mask": comp_mask,
        "advantages": advantages,
        "pixel_values": pixels,
    }
    return packed, shared, grid


def test_shared_prefix_schema_matches_packed():
    """The shared-prefix train path (prompt forward once per group, KV
    reused by the G completions) must agree with the packed full-sequence
    oracle: same ref logps, same loss/KL/grad_norm, same updated params —
    the flop savings cannot change the math."""
    cfg = tiny_config()
    G, P_len, C = 4, 64, 16
    packed, shared, grid = _two_group_batches(cfg, G=G, P_len=P_len, C=C)

    tx = make_optimizer(learning_rate=1e-3, total_steps=100)
    step = make_grpo_train_step(cfg, tx, beta=0.04, remat=True,
                                attn_impl="xla", logp_chunk=8)

    with jax.default_matmul_precision("highest"):
        ref_a = np.asarray(step.ref_logps_fn(
            init_params(jax.random.key(0), cfg, jnp.float32), packed,
            grid, G, P_len, (1, 1)))
        ref_b = np.asarray(step.ref_logps_fn(
            init_params(jax.random.key(0), cfg, jnp.float32), shared,
            grid, G, None, None))
        np.testing.assert_allclose(ref_a, ref_b, atol=3e-5, rtol=1e-5)

        outs = []
        for batch, pl, gpp in ((packed, P_len, (1, 1)), (shared, None, None)):
            params = init_params(jax.random.key(0), cfg, jnp.float32)
            ref_params = init_params(jax.random.key(0), cfg, jnp.float32)
            opt_state = tx.init(params)
            p2, _, metrics = step(
                params, ref_params, opt_state, batch, grid_thw=grid,
                num_generations=G, prompt_len=pl, grids_per_prompt=gpp)
            outs.append((p2, metrics))
    (pa, ma), (pb, mb) = outs
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(ma["kl"]), float(mb["kl"]), atol=1e-6)
    np.testing.assert_allclose(float(ma["grad_norm"]), float(mb["grad_norm"]),
                               rtol=1e-4, atol=1e-6)
    # updates are lr-sized (1e-3); Adam's grad/sqrt(v) normalization
    # amplifies fp-reassociation noise on near-zero gradient elements, so
    # compare against the update scale, not the raw values
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-5),
        pa, pb,
    )


def test_grpo_step_beta_zero_no_ref():
    """beta=0: the step runs with ref_params=None (no reference forward at
    all) and reproduces the step-0 loss formula; KL metric is exactly 0.
    Matches TRL GRPOConfig beta=0 semantics (no ref model materialized)."""
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    tx = make_optimizer(learning_rate=1e-3, total_steps=100)
    opt_state = tx.init(params)
    P_len, C, G = 64, 16, 4
    batch, grid = _make_batch(cfg, B=1, G=G, P_len=P_len, C=C)
    step = make_grpo_train_step(
        cfg, tx, beta=0.0, prompt_len=P_len, remat=True, attn_impl="xla",
        logp_chunk=8,
    )
    assert step.ref_logps_fn(None, batch, grid, G) is None
    with jax.default_matmul_precision("highest"):
        params2, opt_state, metrics = step(
            params, None, opt_state, batch, grid_thw=grid,
            num_generations=G,
        )
    adv, m = batch["advantages"], batch["completion_mask"]
    expected = -np.mean((adv[:, None] * m).sum(1) / m.sum(1))
    np.testing.assert_allclose(float(metrics["loss"]), expected,
                               rtol=1e-3, atol=1e-4)
    assert float(metrics["kl"]) == 0.0
    assert np.isfinite(float(metrics["grad_norm"]))


def test_step_accum_matches_full_batch():
    """The scan-accumulated one-program step (step.step_accum) over two
    B=1 chunks must reproduce the full-batch B=2 step exactly: grpo_loss
    is a row mean, so mean-of-chunk-gradients == full-batch gradients, and
    both take ONE optimizer apply (the reference's global-batch AdamW
    semantics, run_SpaceR_SG_RLVR.sh:9,21)."""
    cfg = tiny_config()
    G, P_len, C = 4, 64, 16
    _, shared, grid = _two_group_batches(cfg, G=G, P_len=P_len, C=C)
    grid1 = grid[0]
    n_patches = grid1[0] * grid1[1] * grid1[2]

    # stack the B=2 shared-prefix batch into 2 chunks of B=1
    def chunk(b):
        return {
            "prompt_ids": shared["prompt_ids"][b:b + 1],
            "prompt_mask": shared["prompt_mask"][b:b + 1],
            "prompt_position_ids": shared["prompt_position_ids"][:, b:b + 1],
            "completion_ids": shared["completion_ids"][b * G:(b + 1) * G],
            "completion_position_ids":
                shared["completion_position_ids"][:, b * G:(b + 1) * G],
            "completion_mask": shared["completion_mask"][b * G:(b + 1) * G],
            "advantages": shared["advantages"][b * G:(b + 1) * G],
            "pixel_values":
                shared["pixel_values"][b * n_patches:(b + 1) * n_patches],
        }
    stacked = jax.tree.map(
        lambda *xs: np.stack(xs), chunk(0), chunk(1))

    tx = make_optimizer(learning_rate=1e-3, total_steps=100)
    step = make_grpo_train_step(cfg, tx, beta=0.04, remat=True,
                                attn_impl="xla", logp_chunk=8)
    with jax.default_matmul_precision("highest"):
        outs = []
        for fn, batch, g, gpp in (
            (step, shared, grid, None),
            (step.step_accum, stacked, (grid1,), None),
        ):
            params = init_params(jax.random.key(0), cfg, jnp.float32)
            ref_params = init_params(jax.random.key(0), cfg, jnp.float32)
            opt_state = tx.init(params)
            p2, _, metrics = fn(
                params, ref_params, opt_state, batch, grid_thw=g,
                num_generations=G, grids_per_prompt=gpp)
            outs.append((p2, metrics))
    (pa, ma), (pb, mb) = outs
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(ma["kl"]), float(mb["kl"]), atol=1e-6)
    np.testing.assert_allclose(float(ma["grad_norm"]),
                               float(mb["grad_norm"]), rtol=1e-4, atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-5),
        pa, pb,
    )

    # bf16 accumulator (the single-chip bench configuration): per-chunk
    # losses are computed before accumulation (identical), and the
    # mean-of-2 bf16 gradient rounding moves grad_norm by well under 1%
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    ref_params = init_params(jax.random.key(0), cfg, jnp.float32)
    with jax.default_matmul_precision("highest"):
        _, _, mc = step.step_accum(
            params, ref_params, tx.init(params), stacked,
            grid_thw=(grid1,), num_generations=G,
            accum_dtype=jnp.bfloat16)
    np.testing.assert_allclose(float(mc["loss"]), float(ma["loss"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(mc["grad_norm"]),
                               float(ma["grad_norm"]), rtol=1e-2)


def test_remat_modes_same_gradients():
    """Rematerialization is a memory/flops schedule, never math: the GRPO
    step must produce identical loss and gradients under full remat,
    dots_narrow, and the mixed per-layer-range policy (dots_mixed:K, which
    saves the wide MLP intermediates for the first K layers only)."""
    cfg = tiny_config()
    G, P_len, C = 4, 64, 16
    _, shared, grid = _two_group_batches(cfg, G=G, P_len=P_len, C=C)

    outs = []
    for remat in (True, "dots_narrow", "dots_mixed:1"):
        tx = make_optimizer(learning_rate=1e-3, total_steps=100)
        step = make_grpo_train_step(cfg, tx, beta=0.04, remat=remat,
                                    attn_impl="xla", logp_chunk=8)
        params = init_params(jax.random.key(0), cfg, jnp.float32)
        ref_params = init_params(jax.random.key(0), cfg, jnp.float32)
        with jax.default_matmul_precision("highest"):
            p2, _, metrics = step(
                params, ref_params, tx.init(params), shared,
                grid_thw=grid, num_generations=G)
        outs.append((p2, metrics))
    (pa, ma), (pb, mb), (pc, mc) = outs
    for m2 in (mb, mc):
        np.testing.assert_allclose(float(ma["loss"]), float(m2["loss"]),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(float(ma["grad_norm"]),
                                   float(m2["grad_norm"]),
                                   rtol=1e-5, atol=1e-7)
    for p2 in (pb, pc):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5),
            pa, p2,
        )


def test_grad_chunk_apply_matches_full_batch():
    """The host-driven chunked accumulation (grad_chunk with a donated
    accumulator + one apply_grads) must match the full-batch step exactly,
    like step_accum — it is the same math in update_groups+1 programs."""
    cfg = tiny_config()
    G, P_len, C = 4, 64, 16
    _, shared, grid = _two_group_batches(cfg, G=G, P_len=P_len, C=C)
    grid1 = grid[0]
    n_patches = grid1[0] * grid1[1] * grid1[2]

    def chunk(b):
        return {
            "prompt_ids": shared["prompt_ids"][b:b + 1],
            "prompt_mask": shared["prompt_mask"][b:b + 1],
            "prompt_position_ids": shared["prompt_position_ids"][:, b:b + 1],
            "completion_ids": shared["completion_ids"][b * G:(b + 1) * G],
            "completion_position_ids":
                shared["completion_position_ids"][:, b * G:(b + 1) * G],
            "completion_mask": shared["completion_mask"][b * G:(b + 1) * G],
            "advantages": shared["advantages"][b * G:(b + 1) * G],
            "pixel_values":
                shared["pixel_values"][b * n_patches:(b + 1) * n_patches],
        }

    tx = make_optimizer(learning_rate=1e-3, total_steps=100)
    step = make_grpo_train_step(cfg, tx, beta=0.04, remat=True,
                                attn_impl="xla", logp_chunk=8)
    with jax.default_matmul_precision("highest"):
        params = init_params(jax.random.key(0), cfg, jnp.float32)
        ref_params = init_params(jax.random.key(0), cfg, jnp.float32)
        opt_state = tx.init(params)
        pa, _, ma = step(
            params, ref_params, opt_state, shared, grid_thw=grid,
            num_generations=G)

        params = init_params(jax.random.key(0), cfg, jnp.float32)
        opt_state = tx.init(params)
        gacc = step.init_gacc(params)
        losses = []
        for b in range(2):
            gacc, metrics = step.grad_chunk(
                params, ref_params, gacc, chunk(b), grid_thw=(grid1,),
                num_generations=G)
            losses.append(float(metrics["loss"]))
        pb, _, gnorm, gacc2 = step.apply_grads(
            params, opt_state, gacc, n_accum=2)
    np.testing.assert_allclose(float(ma["loss"]), np.mean(losses),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(ma["grad_norm"]), float(gnorm),
                               rtol=1e-4, atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-5),
        pa, pb,
    )
    # the returned accumulator is zeroed for the next step
    assert all(float(jnp.abs(leaf).max()) == 0.0
               for leaf in jax.tree_util.tree_leaves(gacc2))
