"""End-to-end SG-RLVR trainer smoke test: tiny model, real mp4 decode,
rollout -> rewards -> update -> checkpoint round-trip."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spacer_tpu.data import MockTokenizer, VLProcessor
from spacer_tpu.data.templates import make_conversation
from spacer_tpu.models.qwen25_vl import tiny_config, init_params
from spacer_tpu.rewards import accuracy_reward, format_reward
from spacer_tpu.train.trainer import SGRLVRConfig, SGRLVRTrainer


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("vid") / "clip1.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (128, 96))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (96, 128, 3), np.uint8)
    for t in range(60):
        w.write(np.roll(base, t * 3, axis=1))
    w.release()
    return path


def _dataset(video_path):
    rows = []
    for i in range(2):
        row = {
            "problem": f"How many chairs are visible? ({i})",
            "problem_type": "numerical",
            "solution": "<answer>3</answer>",
            "path": video_path,
            "data_type": "video",
            "data_source": "SR_dataset",
            "problem_id": i,
        }
        video_id = os.path.splitext(os.path.basename(video_path))[0]
        map_data = {video_id: {
            "cognitive_map": {"chair": [[1, 2], [5, 5]], "table": [[8, 8]]},
            "object_list": ["chair", "table"],
        }}
        row.update(make_conversation(row, map_data))
        rows.append((row, map_data))
    return [r for r, _ in rows], rows[0][1]


def test_trainer_two_steps_and_checkpoint(video_path, tmp_path):
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    tok = MockTokenizer(vocab_size=cfg.text.vocab_size)
    proc = VLProcessor(tok, cfg, min_pixels=3136, max_pixels=401408)
    dataset, map_data = _dataset(video_path)

    args = SGRLVRConfig(
        num_generations=4,
        max_prompt_length=512,
        max_completion_length=16,
        learning_rate=1e-4,
        temporal=True,
        len_control=True,
        max_steps=2,
        logging_steps=1,
        save_steps=100,
        output_dir=str(tmp_path / "out"),
        prompt_bucket=128,
        remat=False,
        logp_chunk=16,
        attn_impl="xla",
    )
    trainer = SGRLVRTrainer(
        cfg, params, proc, [accuracy_reward, format_reward], dataset, args,
        map_data=map_data,
    )
    trainer.train()
    assert trainer.global_step == 2

    metrics_file = os.path.join(args.output_dir, "metrics.jsonl")
    records = [json.loads(l) for l in open(metrics_file)]
    assert len(records) == 2
    for rec in records:
        assert np.isfinite(rec["loss"])
        assert "rewards/accuracy_reward" in rec
        assert "rewards/format_reward" in rec
        assert "completion_length" in rec
        assert rec["time/rollout_s"] > 0

    # checkpoint round-trip
    ckpt = trainer.save_checkpoint()
    step_before = trainer.global_step
    p_before = jax.tree.leaves(trainer.params)[0]
    trainer.global_step = 0
    trainer.load_checkpoint(ckpt)
    assert trainer.global_step == step_before
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(trainer.params)[0]), np.asarray(p_before)
    )


def test_merged_temporal_rollout_matches_sequential(video_path, tmp_path):
    """merge_temporal_rollout decodes main + shuffled rollouts in ONE
    grouped program; under greedy decoding it must produce exactly the
    sequential path's completions, rewards and loss (scheduling must not
    change the math — VERDICT r2 #2)."""
    def run(merge, tag):
        cfg = tiny_config()
        params = init_params(jax.random.key(0), cfg, jnp.float32)
        tok = MockTokenizer(vocab_size=cfg.text.vocab_size)
        proc = VLProcessor(tok, cfg, min_pixels=3136, max_pixels=401408)
        dataset, map_data = _dataset(video_path)
        args = SGRLVRConfig(
            num_generations=4, rollout_batch_size=2,
            max_prompt_length=512, max_completion_length=12,
            learning_rate=1e-4, temporal=True, len_control=True,
            temperature=0.0, merge_temporal_rollout=merge,
            max_steps=1, logging_steps=1, save_steps=100,
            output_dir=str(tmp_path / f"out_{tag}"), prompt_bucket=128,
            remat=False, logp_chunk=16, attn_impl="xla",
        )
        trainer = SGRLVRTrainer(
            cfg, params, proc, [accuracy_reward, format_reward], dataset,
            args, map_data=map_data,
        )
        captured = {}
        orig = trainer.step_fn

        def spy(p, rp, o, batch, **kw):
            captured["completion_ids"] = np.asarray(batch["completion_ids"])
            return orig(p, rp, o, batch, **kw)

        spy.ref_logps_fn = orig.ref_logps_fn
        trainer.step_fn = spy
        rng = np.random.default_rng(7)
        metrics = trainer.training_step(dataset, rng)
        return captured["completion_ids"], dict(trainer._metrics), metrics

    ids_m, mm, met_m = run(True, "merged")
    ids_s, ms, met_s = run(False, "seq")
    np.testing.assert_array_equal(ids_m, ids_s)
    for k in ("rewards/accuracy_reward", "rewards/format_reward",
              "temporal_rewards", "reward", "completion_length"):
        assert mm[k] == ms[k], (k, mm[k], ms[k])
    np.testing.assert_allclose(
        float(met_m["loss"]), float(met_s["loss"]), rtol=1e-6, atol=1e-7)


def test_pixel_cast_follows_vision_tower_dtype(tmp_path):
    """The pixel wire dtype must follow the VISION tower's param dtype —
    a mixed-precision checkpoint (bf16 LM + f32 vision) previously took
    it from the alphabetically-first LM leaf and silently degraded
    vision-input precision on f32 vision towers."""
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    tok = MockTokenizer(vocab_size=cfg.text.vocab_size)
    proc = VLProcessor(tok, cfg, min_pixels=3136, max_pixels=401408)
    args = SGRLVRConfig(num_generations=2, max_steps=1, beta=0.0,
                        output_dir=str(tmp_path / "out"))

    bf16_lm = dict(params)
    bf16_lm["model"] = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), params["model"])
    tr = SGRLVRTrainer(cfg, bf16_lm, proc, [], [], args)
    assert tr._pixel_cast is None  # vision tower is f32: no bf16 wire cast

    bf16_vis = dict(params)
    bf16_vis["visual"] = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), params["visual"])
    tr2 = SGRLVRTrainer(cfg, bf16_vis, proc, [], [], args)
    assert tr2._pixel_cast == jnp.bfloat16
