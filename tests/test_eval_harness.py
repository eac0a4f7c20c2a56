"""Harness plumbing: worker sharding, per-rank jsonl, merge, scoring — run
against synthesized benchmark data with a canned-answer engine."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from spacer_tpu.evalharness import EvalConfig, EchoEngine, run_benchmark
from spacer_tpu.evalharness.util import load_video_frames


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("videos")
    d = root / "scannet"
    d.mkdir()
    for name in ["scene1", "scene2"]:
        path = str(d / f"{name}.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                            (640, 480))
        base = np.random.default_rng(0).integers(0, 255, (480, 640, 3),
                                                 np.uint8)
        for t in range(90):
            w.write(np.roll(base, t, axis=0))
        w.release()
    return str(root)


def test_load_video_frames_reference_quirks(video_dir):
    frames, timestamps, duration = load_video_frames(
        os.path.join(video_dir, "scannet", "scene1.mp4"),
        num_frames=8, fps=1, target_resolution=(448, 448),
    )
    # 3s video at fps 1 -> min(8, 3) = 3 frames
    assert len(frames) == 3
    assert duration == 3
    assert timestamps == [0, 1, 2]
    # the reference's (w,h) swap: a 640x480 landscape comes out 336x448
    assert frames[0].size == (336, 448)


def test_vsibench_end_to_end(video_dir, tmp_path):
    rows = []
    for i, (scene, qt, gt) in enumerate([
        ("scene1", "object_counting", "3"),
        ("scene1", "object_rel_distance", "A"),
        ("scene2", "route_planning", "B"),
        ("scene2", "room_size_estimation", "12.5"),
    ]):
        rows.append({
            "id": i, "dataset": "scannet", "scene_name": scene,
            "question": f"q{i}", "options": ["A. x", "B. y"] if qt in (
                "object_rel_distance", "route_planning") else [],
            "ground_truth": gt, "question_type": qt,
        })
    pq = tmp_path / "vsi.parquet"
    pd.DataFrame(rows).to_parquet(pq)

    def responder(messages):
        text = messages[0]["content"][-1]["text"]
        assert "10x10 grid" in text  # thinking/cogmap template
        if "q0" in text:
            return "<think>t</think><answer>three</answer>"
        if "q1" in text:
            return "<answer>A</answer>"
        if "q2" in text:
            return "<answer>C</answer>"
        return "<answer>12 square meters</answer>"

    engine = EchoEngine(responder)
    cfg = EvalConfig(
        task="VSI-Bench", output_dir=str(tmp_path / "out"), world_size=2,
        num_frames=4, fps=1, prompt_type="thinking",
        data_file=str(pq), video_dir=video_dir,
    )
    metrics = run_benchmark(cfg, engine)

    # shards written and merged
    for rank in range(2):
        assert os.path.exists(
            tmp_path / "out" / f"VSI-Bench_results_rank_{rank}.jsonl"
        )
    merged = tmp_path / "out" / "VSI-Bench_results.jsonl"
    docs = [json.loads(l) for l in open(merged)]
    assert len(docs) == 4

    assert metrics["object_counting_MRA:.5:.95:.05"] == 1.0  # "three" == 3
    assert metrics["object_rel_distance_accuracy"] == 1.0
    assert metrics["route_planning_accuracy"] == 0.0
    # 12 vs 12.5: rel err 0.04 -> all 10 thresholds pass
    assert metrics["room_size_estimation_MRA:.5:.95:.05"] == 1.0
    assert "overall_accuracy" in metrics


def test_tempcompass_end_to_end(tmp_path, video_dir):
    # tempcompass uses flat video dir; reuse scannet files by copying refs
    vdir = os.path.join(video_dir, "scannet")
    rows = [
        {"video_id": "scene1", "problem_type": "multiple choice",
         "problem": "Which color?", "options": ["A. red", "B. blue"],
         "solution": "<answer>A. red</answer>"},
        {"video_id": "scene2", "problem_type": "multiple choice",
         "problem": "Which shape?", "options": ["A. square", "B. round"],
         "solution": "<answer>B. round</answer>"},
    ]
    data = tmp_path / "tc.json"
    with open(data, "w") as f:
        json.dump(rows, f)

    engine = EchoEngine(lambda m: "<answer>A</answer>")
    cfg = EvalConfig(
        task="TempCompass", output_dir=str(tmp_path / "out"), world_size=1,
        num_frames=4, fps=1, prompt_type="thinking",
        data_file=str(data), video_dir=vdir,
    )
    metrics = run_benchmark(cfg, engine)
    assert metrics["overall_accuracy"] == pytest.approx(0.5)


def test_eval_temperature_plumbs_to_engine(video_dir, tmp_path):
    """EvalConfig.temperature reaches the engine call (reference default
    0.01, evaluate.py:106-118; 0.0 is the greedy setting speculative
    decoding requires)."""
    rows = [{
        "id": 0, "dataset": "scannet", "scene_name": "scene1",
        "question": "q", "options": [], "ground_truth": "3",
        "question_type": "object_counting",
    }]
    pq = tmp_path / "vsi.parquet"
    pd.DataFrame(rows).to_parquet(pq)

    seen = []

    class Recorder(EchoEngine):
        def generate(self, messages_list, *, max_new_tokens=128,
                     temperature=0.01):
            seen.append(temperature)
            return super().generate(
                messages_list, max_new_tokens=max_new_tokens,
                temperature=temperature)

    cfg = EvalConfig(
        task="VSI-Bench", output_dir=str(tmp_path / "out"),
        num_frames=4, fps=1, data_file=str(pq), video_dir=video_dir,
        temperature=0.0,
    )
    run_benchmark(cfg, Recorder())
    assert seen == [0.0]
