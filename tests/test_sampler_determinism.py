"""Sampler determinism and eval default-prompt mode."""

import numpy as np
import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl import tiny_config, init_params, get_rope_index
from spacer_tpu.sampler import Sampler


def test_same_seed_same_tokens():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(10, cfg.text.vocab_size, size=(1, 9))
    mask = np.ones_like(ids)
    pos, deltas = get_rope_index(cfg, ids, attention_mask=mask)
    sam = Sampler(cfg, eos_token_id=2, pad_token_id=0, attn_impl="xla",
                  length_bucket=16)

    def gen(seed):
        return sam.generate(
            ids, mask, params, position_ids=pos, deltas=deltas,
            num_generations=2, max_new_tokens=6, temperature=1.0,
            top_p=0.95, seed=seed,
        ).sequences

    a, b, c = gen(7), gen(7), gen(8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_vsibench_default_prompt_mode(tmp_path):
    """prompt_type='default' uses the plain template and 128-token budget."""
    import pandas as pd

    from spacer_tpu.evalharness import EvalConfig, EchoEngine, run_benchmark

    import cv2

    vdir = tmp_path / "scannet"
    vdir.mkdir()
    path = str(vdir / "s.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (128, 96))
    for t in range(60):
        w.write(np.full((96, 128, 3), t, np.uint8))
    w.release()

    rows = [{"id": 0, "dataset": "scannet", "scene_name": "s",
             "question": "How many?", "options": [],
             "ground_truth": "2", "question_type": "object_counting"}]
    pq = tmp_path / "v.parquet"
    pd.DataFrame(rows).to_parquet(pq)

    seen = {}

    def responder(messages):
        seen["text"] = messages[0]["content"][-1]["text"]
        return "2"

    cfg = EvalConfig(task="VSI-Bench", output_dir=str(tmp_path / "out"),
                     world_size=1, num_frames=4, prompt_type="default",
                     data_file=str(pq), video_dir=str(tmp_path))
    metrics = run_benchmark(cfg, EchoEngine(responder))
    assert "10x10 grid" not in seen["text"]  # no cogmap template
    assert "numerical value" in seen["text"]
    assert metrics["object_counting_MRA:.5:.95:.05"] == 1.0
