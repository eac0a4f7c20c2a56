"""Global-batch (B prompt-groups per optimizer step) training tests.

The reference trains 8 prompts per global step (8 procs x bs 1,
run_SpaceR_SG_RLVR.sh:9,21) with advantages normalized per group
(SG_RLVR_trainer.py:632-638). Here one SPMD process covers the mesh and
rollout_batch_size=B supplies the same semantics.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl import (
    get_rope_index,
    init_params,
    tiny_config,
)
from spacer_tpu.parallel import batch_spec, create_mesh, shard_params
from spacer_tpu.train.step import make_grpo_train_step, tile_vision_embeds


def test_tile_vision_embeds_row_order():
    cfg = tiny_config()
    mu = cfg.vision.spatial_merge_unit
    # two prompts: grids with 2*2*2=8 and 2*2*4=16 patches
    grids = ((2, 2, 2), (2, 2, 4))
    n0, n1 = 8 // mu, 16 // mu
    ve = jnp.arange((n0 + n1)).astype(jnp.float32)[:, None]  # (N, 1)
    G = 3
    out = np.asarray(tile_vision_embeds(ve, cfg, grids, G, (1, 1)))
    # group-major: [p0 embeds] * G then [p1 embeds] * G
    expect = np.concatenate(
        [np.tile(np.arange(n0), G), np.tile(np.arange(n0, n0 + n1), G)]
    )[:, None]
    np.testing.assert_array_equal(out, expect)
    # single-prompt fast path == plain tile
    out1 = np.asarray(tile_vision_embeds(ve, cfg, grids, G, None))
    np.testing.assert_array_equal(out1, np.tile(np.asarray(ve), (G, 1)))


def _group_batch(cfg, rng, grid, P_len, C, G, vocab_lo=10):
    """One prompt-group batch (G rows) with its own video."""
    n_video = (grid[0] * grid[1] * grid[2]) // 4
    prompt = (
        [vocab_lo, vocab_lo + 1, cfg.vision_start_token_id]
        + [cfg.video_token_id] * n_video
        + [cfg.vision_end_token_id, vocab_lo + 2]
    )
    pad = P_len - len(prompt)
    assert pad >= 0
    prompt_ids = np.array([[cfg.pad_token_id] * pad + prompt])
    prompt_mask = np.array([[0] * pad + [1] * len(prompt)])
    pos, deltas = get_rope_index(
        cfg, prompt_ids, video_grid_thw=np.array([grid]),
        attention_mask=prompt_mask,
    )
    completion = rng.integers(vocab_lo, cfg.text.vocab_size, size=(G, C))
    return {
        "input_ids": np.concatenate(
            [np.repeat(prompt_ids, G, 0), completion], 1
        ).astype(np.int32),
        "kv_mask": np.concatenate(
            [np.repeat(prompt_mask, G, 0), np.ones((G, C))], 1
        ).astype(bool),
        "position_ids": np.concatenate(
            [np.repeat(pos, G, 1),
             np.broadcast_to(
                 (deltas.reshape(-1, 1) + P_len + np.arange(C))[None],
                 (3, G, C))],
            2,
        ).astype(np.int32),
        "completion_mask": np.ones((G, C), np.int32),
        "advantages": rng.normal(size=(G,)).astype(np.float32),
        "pixel_values": rng.normal(
            size=(grid[0] * grid[1] * grid[2], cfg.vision.patch_dim)
        ).astype(np.float32),
    }


def test_multi_prompt_step_matches_per_group_losses():
    """B=2 groups with DIFFERENT videos: the batched loss must equal the
    mean of the two per-group losses (wrong vision tiling would mix the
    videos across groups and break this)."""
    import optax

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    ref_params = jax.tree.map(jnp.copy, params)
    rng = np.random.default_rng(0)
    G, P_len, C = 4, 32, 8
    g0, g1 = (2, 4, 4), (2, 2, 4)
    b0 = _group_batch(cfg, rng, g0, P_len, C, G)
    b1 = _group_batch(cfg, rng, g1, P_len, C, G)

    tx = optax.sgd(0.0)  # no update: compare pure losses
    step = make_grpo_train_step(cfg, tx, beta=0.04, remat=False, logp_chunk=8)

    losses = []
    for b, g in ((b0, (g0,)), (b1, (g1,))):
        _, _, m = step(
            jax.tree.map(jnp.copy, params), ref_params, tx.init(params),
            {k: jnp.asarray(v) for k, v in b.items()},
            grid_thw=g, num_generations=G, prompt_len=P_len,
        )
        losses.append(float(m["loss"]))

    merged = {
        k: jnp.asarray(np.concatenate([b0[k], b1[k]], axis=1 if k == "position_ids" else 0))
        for k in b0
    }
    _, _, m = step(
        params, ref_params, tx.init(params), merged,
        grid_thw=(g0, g1), num_generations=G, prompt_len=P_len,
        grids_per_prompt=(1, 1),
    )
    np.testing.assert_allclose(
        float(m["loss"]), np.mean(losses), rtol=2e-5, atol=2e-6
    )


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("vid") / "clipgb.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                        (128, 96))
    rng = np.random.default_rng(1)
    base = rng.integers(0, 255, (96, 128, 3), np.uint8)
    for t in range(60):
        w.write(np.roll(base, t * 3, axis=1))
    w.release()
    return path


def test_trainer_global_batch_on_mesh(video_path, tmp_path):
    """B=4, G=4 on the 8-device mesh: per-group advantage normalization and
    explicit data x fsdp batch sharding (VERDICT r1 item 3)."""
    import os

    from spacer_tpu.data import MockTokenizer, VLProcessor
    from spacer_tpu.data.templates import make_conversation
    from spacer_tpu.rewards import accuracy_reward, format_reward
    from spacer_tpu.train.trainer import SGRLVRConfig, SGRLVRTrainer

    cfg = tiny_config()
    mesh = create_mesh({"data": 2, "fsdp": 4})
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    params, _ = shard_params(params, mesh)
    tok = MockTokenizer(vocab_size=cfg.text.vocab_size)
    proc = VLProcessor(tok, cfg, min_pixels=3136, max_pixels=401408)

    video_id = os.path.splitext(os.path.basename(video_path))[0]
    map_data = {video_id: {
        "cognitive_map": {"chair": [[1, 2], [5, 5]]},
        "object_list": ["chair"],
    }}
    dataset = []
    for i in range(4):
        row = {
            "problem": f"How many chairs? ({i})",
            "problem_type": "numerical",
            "solution": "<answer>3</answer>",
            "path": video_path,
            "data_type": "video",
            "data_source": "SR_dataset",
            "problem_id": i,
        }
        row.update(make_conversation(row, map_data))
        dataset.append(row)

    args = SGRLVRConfig(
        num_generations=4, rollout_batch_size=4,
        max_prompt_length=512, max_completion_length=16,
        learning_rate=1e-4, temporal=False, len_control=True,
        max_steps=1, logging_steps=1, save_steps=100,
        output_dir=str(tmp_path / "out"), prompt_bucket=128,
        remat=False, logp_chunk=16, attn_impl="xla",
    )
    trainer = SGRLVRTrainer(
        cfg, params, proc, [accuracy_reward, format_reward], dataset, args,
        map_data=map_data, mesh=mesh,
    )

    captured = {}
    orig_step = trainer.step_fn

    def spy(params, ref_params, opt_state, batch, **kw):
        captured["advantages"] = np.asarray(batch["advantages"])
        captured["ids_sharding"] = batch["completion_ids"].sharding
        captured["n_rows"] = batch["completion_ids"].shape[0]
        return orig_step(params, ref_params, opt_state, batch, **kw)

    spy.ref_logps_fn = orig_step.ref_logps_fn
    trainer.step_fn = spy
    trainer.train()

    assert trainer.global_step == 1
    assert captured["n_rows"] == 16  # B*G
    # per-GROUP normalization: each group of 4 has ~zero-mean advantage
    adv = captured["advantages"].reshape(4, 4)
    np.testing.assert_allclose(adv.mean(axis=1), 0.0, atol=1e-5)
    # explicitly placed over data x fsdp
    spec = captured["ids_sharding"].spec
    assert tuple(spec)[0] == batch_spec(mesh)[0]
