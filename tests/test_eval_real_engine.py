"""Real-engine e2e for SPAR-Bench (multi-image base64) and Video-MME
(VERDICT r2 next #6): tiny REAL model + real processor + the continuous-
batching engine — not EchoEngine — driven through the full harness.

The SPAR base64 data-URI image path (reference
SpaceR-Eval/data_utils/sparbench.py:183-191) previously only ever met the
test double; here the images go through fetch -> smart_resize -> ViT ->
sampler for real, in MIXED single/multi-image batches, under
serving="continuous".
"""

import io
import json
import os

import numpy as np
import pandas as pd
import pytest
import jax
import jax.numpy as jnp

from spacer_tpu.data import MockTokenizer, VLProcessor
from spacer_tpu.evalharness import EvalConfig, QwenEngine, run_benchmark
from spacer_tpu.models.qwen25_vl import init_params, tiny_config


def _engine():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    tok = MockTokenizer(vocab_size=cfg.text.vocab_size)
    proc = VLProcessor(tok, cfg, min_pixels=3136, max_pixels=12544)
    return QwenEngine(cfg, params, proc, attn_impl="xla", length_bucket=64)


def _png_bytes(seed, size=56):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(seed).integers(0, 255, (size, size, 3),
                                             np.uint8)
    ).save(buf, format="PNG")
    return buf.getvalue()


def test_sparbench_real_engine_continuous(tmp_path):
    rows = [
        {"id": 1, "task": "depth_prediction_oc", "question": "How deep?",
         "answer": "3.5", "img_type": "single",
         "image": [{"bytes": _png_bytes(0)}]},
        {"id": 2, "task": "obj_spatial_relation_oo", "question": "Where?",
         "answer": "A", "img_type": "multi",
         "image": [{"bytes": _png_bytes(1)}, {"bytes": _png_bytes(2)}]},
        {"id": 3, "task": "view_change_infer", "question": "Actions?",
         "answer": "move_right:1,move_up:0", "img_type": "multi",
         "image": [{"bytes": _png_bytes(3)}, {"bytes": _png_bytes(4)}]},
    ]
    pq = tmp_path / "spar_real.parquet"
    pd.DataFrame(rows).to_parquet(pq)

    cfg = EvalConfig(
        task="SPAR-Bench", output_dir=str(tmp_path / "out"), world_size=1,
        data_file=[str(pq)], video_dir=".", batch_size=2,
        max_new_tokens=6, prompt_type="default", serving="continuous",
    )
    metrics = run_benchmark(cfg, _engine())

    docs = [json.loads(l) for l in
            open(tmp_path / "out" / "SPAR-Bench_results.jsonl")]
    assert len(docs) == 3
    # real sampler output: every row got a (token-soup) prediction and the
    # scorer consumed it without falling over
    assert all(isinstance(d["predicted_answer"], str) for d in docs)
    assert "overall" in metrics and "by_img_type" in metrics
    assert "overall_accuracy" in metrics["overall"]
    # both image types flowed through the REAL vision encode
    assert set(d["image_type"] for d in docs) == {"single", "multi"}


@pytest.fixture(scope="module")
def tiny_video_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("realvids")
    rng = np.random.default_rng(0)
    for name in ("v1", "v2"):
        w = cv2.VideoWriter(str(d / f"{name}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 8.0, (64, 48))
        for t in range(16):
            w.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
        w.release()
    return str(d)


def test_stibench_real_engine_continuous(tiny_video_dir, tmp_path):
    rows = [
        {"ID": 1, "Video": "v1.mp4", "Task": "Spatial Relation",
         "Question": "Left or right?",
         "Candidates": {"A": "left", "B": "right"},
         "time_start": 0, "time_end": 2, "Answer": "A"},
        {"ID": 2, "Video": "v2.mp4", "Task": "Speed & Acceleration",
         "Question": "Fast?", "Candidates": {"A": "yes", "B": "no"},
         "time_start": 1, "time_end": 2, "Answer": "B"},
    ]
    pq = tmp_path / "sti_real.parquet"
    pd.DataFrame(rows).to_parquet(pq)
    cfg = EvalConfig(
        task="STI-Bench", output_dir=str(tmp_path / "out"), world_size=1,
        num_frames=4, data_file=str(pq), video_dir=tiny_video_dir,
        batch_size=2, max_new_tokens=6, serving="continuous",
    )
    metrics = run_benchmark(cfg, _engine())
    docs = [json.loads(l) for l in
            open(tmp_path / "out" / "STI-Bench_results.jsonl")]
    assert len(docs) == 2
    assert all(isinstance(d["predicted_answer"], str) for d in docs)
    # the time-window phrasing survived the real processor round trip
    assert "From 0 seconds to 2 seconds." in docs[0]["promt"]
    assert "sr_sub_accuracy" in metrics


def test_longvideobench_real_engine_continuous(tiny_video_dir, tmp_path):
    rows = [
        {"id": 1, "video_id": "v1", "question": "What happened?",
         "candidates": ["first", "second", "third"], "correct_choice": 1,
         "question_category": "S2E", "topic_category": "t",
         "duration": 2.0},
        {"id": 2, "video_id": "v2", "question": "Then what?",
         "candidates": ["x", "y"], "correct_choice": 0,
         "question_category": "S2E", "topic_category": "t",
         "duration": 2.0},
    ]
    data = tmp_path / "lvb_real.json"
    json.dump(rows, open(data, "w"))
    cfg = EvalConfig(
        task="LongVideoBench", output_dir=str(tmp_path / "out"),
        world_size=1, num_frames=4, data_file=str(data),
        video_dir=tiny_video_dir, batch_size=2, max_new_tokens=6,
        serving="continuous",
    )
    metrics = run_benchmark(cfg, _engine())
    docs = [json.loads(l) for l in
            open(tmp_path / "out" / "LongVideoBench_results.jsonl")]
    assert len(docs) == 2
    assert "B. second" in docs[0]["promt"]
    assert "overall_accuracy" in metrics


def test_tempcompass_real_engine_continuous(tiny_video_dir, tmp_path):
    rows = [
        {"video_id": "v1", "problem_type": "multiple choice",
         "problem": "Which color?", "options": ["A. red", "B. blue"],
         "solution": "<answer>A. red</answer>"},
        {"video_id": "v2", "problem_type": "multiple choice",
         "problem": "Which shape?", "options": ["A. square", "B. round"],
         "solution": "<answer>B. round</answer>"},
    ]
    data = tmp_path / "tc_real.json"
    with open(data, "w") as f:
        json.dump(rows, f)
    cfg = EvalConfig(
        task="TempCompass", output_dir=str(tmp_path / "out"), world_size=1,
        num_frames=4, fps=1, prompt_type="thinking", data_file=str(data),
        video_dir=tiny_video_dir, batch_size=2, max_new_tokens=6,
        serving="continuous",
    )
    metrics = run_benchmark(cfg, _engine())
    docs = [json.loads(l) for l in
            open(tmp_path / "out" / "TempCompass_results.jsonl")]
    assert len(docs) == 2
    # this task stores the model output under 'prediction' (reference quirk)
    assert all(isinstance(d["prediction"], str) for d in docs)
    assert "overall_accuracy" in metrics


def test_videomme_real_engine_continuous(tmp_path):
    import cv2

    vdir = tmp_path / "videos"
    vdir.mkdir()
    path = str(vdir / "v1.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 8.0, (64, 48))
    rng = np.random.default_rng(0)
    for t in range(16):
        w.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
    w.release()

    rows = [
        {"question_id": "q1", "videoID": "v1", "question": "Which?",
         "options": ["A. x", "B. y"], "answer": "A",
         "task_type": "Temporal", "duration": "short"},
        {"question_id": "q2", "videoID": "v1", "question": "Which now?",
         "options": ["A. x", "B. y"], "answer": "B",
         "task_type": "Temporal", "duration": "short"},
    ]
    pq = tmp_path / "vmme_real.parquet"
    pd.DataFrame(rows).to_parquet(pq)
    cfg = EvalConfig(
        task="Video-MME", output_dir=str(tmp_path / "out"), world_size=1,
        num_frames=4, data_file=str(pq), video_dir=str(vdir),
        batch_size=2, max_new_tokens=6, serving="continuous",
    )
    metrics = run_benchmark(cfg, _engine())
    docs = [json.loads(l) for l in
            open(tmp_path / "out" / "Video-MME_results.jsonl")]
    assert len(docs) == 2
    assert all(isinstance(d["predicted_answer"], str) for d in docs)
    assert "overall_accuracy" in metrics["all_duration_tasks"]
