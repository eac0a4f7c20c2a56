"""Resume semantics: the dataloader position is recovered from global_step
(no repeated or skipped rows), and save_only_model drops optimizer state."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from spacer_tpu.data import MockTokenizer, VLProcessor
from spacer_tpu.models.qwen25_vl import tiny_config, init_params
from spacer_tpu.rewards import format_reward
from spacer_tpu.train.trainer import SGRLVRConfig, SGRLVRTrainer


def _trainer(tmp_path, dataset, **kw):
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    tok = MockTokenizer(vocab_size=cfg.text.vocab_size)
    proc = VLProcessor(tok, cfg)
    args = SGRLVRConfig(
        num_generations=2, max_prompt_length=64, max_completion_length=4,
        output_dir=str(tmp_path / "out"), prompt_bucket=32, remat=False,
        logp_chunk=4, attn_impl="xla", logging_steps=100, save_steps=1000,
        **kw,
    )
    return SGRLVRTrainer(cfg, params, proc, [format_reward], dataset, args)


def _dataset(n=6):
    return [
        {"problem": f"q{i}", "problem_type": "free-form",
         "solution": "<answer>x</answer>", "path": None, "data_type": "text",
         "problem_id": i,
         "prompt": [{"role": "user",
                     "content": [{"type": "text", "text": f"question {i}"}]}]}
        for i in range(n)
    ]


def test_resume_continues_dataloader_position(tmp_path, monkeypatch):
    dataset = _dataset()
    processed = []

    def fake_step(self, row, rng, prepared=None):
        processed.append(row["problem_id"])

    monkeypatch.setattr(SGRLVRTrainer, "training_step", fake_step)

    t1 = _trainer(tmp_path, dataset, max_steps=2)
    t1.train()
    ckpt = t1.save_checkpoint()
    first_two = list(processed)

    processed.clear()
    t2 = _trainer(tmp_path, dataset, max_steps=5)
    t2.train(resume_from_checkpoint=ckpt)
    resumed = list(processed)

    # full run from scratch for the expected order
    processed.clear()
    t3 = _trainer(tmp_path, dataset, max_steps=5)
    t3.train()
    full = list(processed)

    assert first_two == full[:2]
    assert resumed == full[2:]  # no repeats, no skips


def test_save_only_model(tmp_path):
    dataset = _dataset(2)
    t = _trainer(tmp_path, dataset, max_steps=0, save_only_model=True)
    path = t.save_checkpoint()
    assert os.path.exists(os.path.join(path, "params"))
    assert not os.path.exists(os.path.join(path, "opt_state"))
