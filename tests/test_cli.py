"""CLI entry-point smoke tests: tiny random model, real mp4, 1-2 steps."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("cli_data")
    vid = root / "clip.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                        (128, 96))
    base = np.random.default_rng(0).integers(0, 255, (96, 128, 3), np.uint8)
    for t in range(60):
        w.write(np.roll(base, 2 * t, axis=1))
    w.release()

    rows = [
        {"problem": "How many chairs?", "problem_type": "numerical",
         "solution": "<answer>3</answer>", "path": str(vid),
         "data_type": "video", "data_source": "SR_dataset", "problem_id": 0},
        {"problem": "Pick one.", "problem_type": "multiple choice",
         "options": ["A. x", "B. y"], "solution": "<answer>A</answer>",
         "path": str(vid), "data_type": "video", "data_source": "other",
         "problem_id": 1},
    ]
    ds = root / "train.jsonl"
    with open(ds, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    maps = root / "cogmap.jsonl"
    with open(maps, "w") as f:
        f.write(json.dumps({
            "video_id": "clip",
            "cognitive_map": {"chair": [[1, 2]], "table": [[7, 7]]},
            "object_list": ["chair", "table"],
        }) + "\n")
    return root


def test_train_sg_rlvr_cli(data_dir, tmp_path):
    from spacer_tpu.cli.train_sg_rlvr import main

    out = tmp_path / "out"
    main([
        "--dataset_name", str(data_dir / "train.jsonl"),
        "--cognitive_map_path", str(data_dir / "cogmap.jsonl"),
        "--random_init", "true",
        "--output_dir", str(out),
        "--max_steps", "1",
        "--num_generations", "4",
        "--max_prompt_length", "512",
        "--max_completion_length", "8",
        "--prompt_bucket", "128",
        "--remat", "false",
        "--logp_chunk", "8",
        "--attn_impl", "xla",
    ])
    recs = [json.loads(l) for l in open(out / "metrics.jsonl")]
    assert len(recs) == 1 and np.isfinite(recs[0]["loss"])
    assert os.path.exists(out / "final")


def test_train_sft_cli(data_dir, tmp_path):
    from spacer_tpu.cli.train_sft import main

    out = tmp_path / "sft_out"
    main([
        "--dataset_name", str(data_dir / "train.jsonl"),
        "--random_init", "true",
        "--output_dir", str(out),
        "--max_steps", "2",
        "--seq_bucket", "128",
        "--remat", "false",
        "--logp_chunk", "8",
        "--attn_impl", "xla",
    ])
    recs = [json.loads(l) for l in open(out / "metrics.jsonl")]
    assert len(recs) == 2
    assert all(np.isfinite(r["loss"]) and r["loss"] > 0 for r in recs)


def test_config_parser_yaml_and_overrides(tmp_path):
    import yaml

    from spacer_tpu.train.trainer import SGRLVRConfig
    from spacer_tpu.cli.common import ModelArgs
    from spacer_tpu.utils.config import parse_configs

    cfg_file = tmp_path / "cfg.yaml"
    yaml.safe_dump({"learning_rate": 2e-6, "temporal": False,
                    "model_name_or_path": "/x"}, cfg_file.open("w"))
    train, model = parse_configs(
        (SGRLVRConfig, ModelArgs),
        ["--config", str(cfg_file), "--beta", "0.1", "--tp", "2"],
    )
    assert train.learning_rate == 2e-6
    assert train.temporal is False
    assert train.beta == 0.1
    assert model.model_name_or_path == "/x"
    assert model.tp == 2

    with pytest.raises(ValueError):
        parse_configs((SGRLVRConfig,), ["--nonexistent", "1"])


def test_serve_cli(data_dir, tmp_path):
    """Offline batch serving: jsonl in -> completions jsonl out, through
    the continuous-batching engine on the tiny random model."""
    from spacer_tpu.cli.serve import main

    prompts = tmp_path / "prompts.jsonl"
    with open(prompts, "w") as f:
        f.write(json.dumps({"id": 0, "prompt": "hello there"}) + "\n")
        f.write(json.dumps({"id": 1, "prompt": "another question",
                            "video": str(data_dir / "clip.mp4")}) + "\n")
        f.write(json.dumps({"id": 2, "messages": [{
            "role": "user",
            "content": [{"type": "text", "text": "chat format"}]}]}) + "\n")
    out = tmp_path / "done.jsonl"
    main([
        "--input_file", str(prompts),
        "--output_file", str(out),
        "--random_init", "true",
        "--max_new_tokens", "4",
        "--temperature", "0",
        "--slots", "2",
        "--chunk_steps", "2",
    ])
    rows = [json.loads(line) for line in open(out)]
    assert [r["id"] for r in rows] == [0, 1, 2]
    assert all(isinstance(r["completion"], str) for r in rows)

    # static path produces the same greedy completions
    out2 = tmp_path / "done_static.jsonl"
    main([
        "--input_file", str(prompts),
        "--output_file", str(out2),
        "--random_init", "true",
        "--max_new_tokens", "4",
        "--temperature", "0",
        "--serving", "static",
    ])
    rows2 = [json.loads(line) for line in open(out2)]
    assert [r["completion"] for r in rows] == [r["completion"] for r in rows2]
