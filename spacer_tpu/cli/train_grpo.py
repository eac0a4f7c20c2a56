"""Plain video-GRPO entry point (grpo.py equivalent: simpler rewards, no
cognitive-map bonus; MC exact match + numerical MRA only, grpo.py:65-178)."""

from __future__ import annotations

import dataclasses
from typing import Optional

from spacer_tpu.cli.common import (
    ModelArgs,
    load_model_and_processor,
    setup_distributed,
)
from spacer_tpu.utils.config import parse_configs


def grpo_accuracy_reward(completions, solution, **kwargs):
    """grpo.py:65-178 variant: only MC / numerical types score; everything
    else (OCR, free-form, regression) is 0.0."""
    from spacer_tpu.rewards.accuracy import accuracy_reward

    qtype = kwargs["problem_type"][0]
    if qtype not in ("multiple choice", "numerical"):
        return [0.0] * len(completions)
    kwargs.pop("map_data", None)
    return accuracy_reward(completions, solution, map_data=None, **kwargs)


@dataclasses.dataclass
class ScriptArgs:
    dataset_name: str = "dataset.jsonl"
    reward_funcs: tuple = ("accuracy", "format")
    resume_from_checkpoint: Optional[str] = None
    max_rows: Optional[int] = None


def main(argv=None):
    from spacer_tpu.data import load_jsonl_dataset, make_conversation
    from spacer_tpu.rewards.format import format_reward
    from spacer_tpu.train.trainer import SGRLVRConfig, SGRLVRTrainer

    script, train_cfg, model_args = parse_configs(
        (ScriptArgs, SGRLVRConfig, ModelArgs), argv
    )
    setup_distributed(model_args)
    cfg, params, processor, mesh = load_model_and_processor(model_args)

    rows = load_jsonl_dataset(script.dataset_name)
    if script.max_rows:
        rows = rows[: script.max_rows]
    dataset = [{**r, **make_conversation(r, None)} for r in rows]

    registry = {"accuracy": grpo_accuracy_reward, "format": format_reward}
    reward_funcs = [registry[n] for n in script.reward_funcs]

    trainer = SGRLVRTrainer(
        cfg, params, processor, reward_funcs, dataset, train_cfg,
        map_data=None, mesh=mesh,
    )
    trainer.train(resume_from_checkpoint=script.resume_from_checkpoint)
    trainer.save_checkpoint(train_cfg.output_dir + "/final")


if __name__ == "__main__":
    main()
