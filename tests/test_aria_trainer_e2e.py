"""End-to-end GRPO trainer smoke with the Aria family: real png image,
rollout -> rewards -> update (the reference grpo.py Aria branch)."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spacer_tpu.data.aria_processor import AriaProcessor, MockAriaTokenizer
from spacer_tpu.models.aria import init_params, tiny_aria_config
from spacer_tpu.rewards import accuracy_reward, format_reward
from spacer_tpu.train.trainer import SGRLVRConfig, SGRLVRTrainer


@pytest.fixture(scope="module")
def image_path(tmp_path_factory):
    from PIL import Image

    path = str(tmp_path_factory.mktemp("img") / "scene.png")
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, (120, 160, 3), np.uint8)
    ).save(path)
    return path


def _dataset(image_path):
    rows = []
    for i in range(2):
        rows.append({
            "problem": f"How many chairs are visible? ({i})",
            "problem_type": "numerical",
            "solution": "<answer>3</answer>",
            "path": image_path,
            "data_type": "image",
            "data_source": "grpo",
            "problem_id": i,
            "prompt": [{
                "role": "user",
                "content": [
                    {"type": "image"},
                    {"type": "text",
                     "text": f"How many chairs are visible? ({i})"},
                ],
            }],
        })
    return rows


def test_aria_trainer_two_steps(image_path, tmp_path):
    cfg = tiny_aria_config()
    # 56px crops -> 16 patches -> 8 queries per image (tiny projector dict)
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    tok = MockAriaTokenizer(vocab_size=cfg.text.vocab_size)
    # tiny projector expects 16-patch (56px) crops with 8 queries each
    proc = AriaProcessor(tok, cfg, max_image_size=56, min_image_size=14,
                         size_conversion={56: 8})

    dataset = _dataset(image_path)
    args = SGRLVRConfig(
        num_generations=4,
        max_prompt_length=512,
        max_completion_length=12,
        learning_rate=1e-4,
        temporal=True,         # no-op for image rows (reference parity)
        len_control=True,
        max_steps=2,
        logging_steps=1,
        save_steps=100,
        output_dir=str(tmp_path / "out"),
        prompt_bucket=256,
        remat=False,
        logp_chunk=16,
        attn_impl="xla",
    )
    trainer = SGRLVRTrainer(
        cfg, params, proc, [accuracy_reward, format_reward], dataset, args,
    )
    trainer.train()
    assert trainer.global_step == 2

    metrics_file = os.path.join(args.output_dir, "metrics.jsonl")
    records = [json.loads(l) for l in open(metrics_file)]
    assert len(records) == 2
    for rec in records:
        assert np.isfinite(rec["loss"])
        assert "rewards/accuracy_reward" in rec
