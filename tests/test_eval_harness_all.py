"""End-to-end harness runs for STI-Bench, SPAR-Bench, Video-MME and
LongVideoBench on synthetic data with a canned-answer engine."""

import base64
import io
import json
import os

import numpy as np
import pandas as pd
import pytest

from spacer_tpu.evalharness import EvalConfig, EchoEngine, run_benchmark


@pytest.fixture(scope="module")
def video_file(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("vids")
    path = str(d / "v1.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (320, 240))
    base = np.random.default_rng(0).integers(0, 255, (240, 320, 3), np.uint8)
    for t in range(60):
        w.write(np.roll(base, t, axis=1))
    w.release()
    return path


def test_stibench_end_to_end(video_file, tmp_path):
    rows = [
        {"ID": 1, "Video": os.path.basename(video_file),
         "Task": "Spatial Relation", "Question": "Left or right?",
         "Candidates": {"A": "left", "B": "right"},
         "time_start": 0, "time_end": 2, "Answer": "A"},
        {"ID": 2, "Video": os.path.basename(video_file),
         "Task": "Speed & Acceleration", "Question": "Fast?",
         "Candidates": {"A": "yes", "B": "no"},
         "time_start": 1, "time_end": 2, "Answer": "B"},
    ]
    pq = tmp_path / "sti.parquet"
    pd.DataFrame(rows).to_parquet(pq)

    engine = EchoEngine(lambda m: "<think>t</think><answer>(A)</answer>")
    cfg = EvalConfig(task="STI-Bench", output_dir=str(tmp_path / "out"),
                     world_size=1, num_frames=4,
                     data_file=str(pq), video_dir=os.path.dirname(video_file))
    metrics = run_benchmark(cfg, engine)
    assert metrics["Spatial Relation"] == 1.0
    assert metrics["Speed & Acceleration"] == 0.0
    assert metrics["sr_sub_accuracy"] == 0.5
    # prompt includes the time window
    docs = [json.loads(l) for l in
            open(tmp_path / "out" / "STI-Bench_results.jsonl")]
    assert "From 0 seconds to 2 seconds." in docs[0]["promt"]


def test_sparbench_end_to_end(tmp_path):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8)
    ).save(buf, format="PNG")
    img_bytes = buf.getvalue()

    rows = [
        {"id": 1, "task": "depth_prediction_oc", "question": "How deep?",
         "answer": "3.5", "img_type": "single",
         "image": [{"bytes": img_bytes}]},
        {"id": 2, "task": "obj_spatial_relation_oo", "question": "Where?",
         "answer": "A", "img_type": "multi",
         "image": [{"bytes": img_bytes}, {"bytes": img_bytes}]},
    ]
    pq = tmp_path / "spar0.parquet"
    pd.DataFrame(rows).to_parquet(pq)

    def responder(messages):
        n_imgs = sum(1 for e in messages[0]["content"] if "image" in e)
        text = messages[0]["content"][-1]["text"]
        if "How deep" in text:
            assert n_imgs == 1
            return "<answer>3.4 meters</answer>"
        assert n_imgs == 2
        return "<answer>A</answer>"

    cfg = EvalConfig(task="SPAR-Bench", output_dir=str(tmp_path / "out"),
                     world_size=1, data_file=[str(pq)], video_dir=".")
    metrics = run_benchmark(cfg, EchoEngine(responder))
    assert metrics["overall"]["obj_spatial_relation_oo_accuracy"] == 1.0
    assert metrics["overall"]["depth_prediction_oc_MRA:.5:.95:.05"] > 0.5
    assert "by_img_type" in metrics


def test_videomme_end_to_end(video_file, tmp_path):
    rows = [
        {"question_id": "q1", "videoID": "v1", "question": "Which?",
         "options": ["A. x", "B. y"], "answer": "A",
         "task_type": "Temporal", "duration": "short"},
        {"question_id": "q2", "videoID": "v1", "question": "Which now?",
         "options": ["A. x", "B. y"], "answer": "B",
         "task_type": "Temporal", "duration": "short"},
    ]
    pq = tmp_path / "vmme.parquet"
    pd.DataFrame(rows).to_parquet(pq)
    engine = EchoEngine(lambda m: "<answer>The correct answer is A</answer>")
    cfg = EvalConfig(task="Video-MME", output_dir=str(tmp_path / "out"),
                     world_size=1, num_frames=4,
                     data_file=str(pq), video_dir=os.path.dirname(video_file))
    metrics = run_benchmark(cfg, engine)
    assert metrics["all_duration_tasks"]["overall_accuracy"] == 0.5
    assert metrics["duration_short"]["Temporal_accuracy"] == 0.5


def test_longvideobench_end_to_end(video_file, tmp_path):
    rows = [
        {"id": 1, "video_id": "v1", "question": "What happened?",
         "candidates": ["first", "second", "third"], "correct_choice": 1,
         "question_category": "S2E", "topic_category": "t",
         "duration": 2.0},
    ]
    data = tmp_path / "lvb.json"
    json.dump(rows, open(data, "w"))
    engine = EchoEngine(lambda m: "<answer>B</answer>")
    cfg = EvalConfig(task="LongVideoBench", output_dir=str(tmp_path / "out"),
                     world_size=1, num_frames=4,
                     data_file=str(data), video_dir=os.path.dirname(video_file))
    metrics = run_benchmark(cfg, engine)
    assert metrics["overall_accuracy"] == 1.0
    assert metrics["perception_task_accuracy"] == 1.0
    # option lettering A.. from candidates appears in the prompt
    docs = [json.loads(l) for l in
            open(tmp_path / "out" / "LongVideoBench_results.jsonl")]
    assert "B. second" in docs[0]["promt"]
