"""SG-RLVR training entry point (SG-RLVR.py equivalent).

Example:
    python -m spacer_tpu.cli.train_sg_rlvr \
        --model_name_or_path /ckpts/Qwen2.5-VL-7B-Instruct \
        --dataset_name SpaceR-151k.jsonl \
        --cognitive_map_path annotation/cognitive_map.jsonl \
        --output_dir output/sg_rlvr --max_pixels 401408 --temporal true
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from spacer_tpu.cli.common import (
    ModelArgs,
    load_model_and_processor,
    setup_distributed,
)
from spacer_tpu.utils.config import parse_configs


@dataclasses.dataclass
class ScriptArgs:
    dataset_name: str = "SpaceR-151k.jsonl"
    cognitive_map_path: str = "annotation/cognitive_map.jsonl"
    reward_funcs: tuple = ("accuracy", "format")
    resume_from_checkpoint: Optional[str] = None
    max_rows: Optional[int] = None


def main(argv=None):
    from spacer_tpu.data import load_cognitive_maps, load_jsonl_dataset, make_conversation
    from spacer_tpu.rewards import get_reward_funcs
    from spacer_tpu.train.trainer import SGRLVRConfig, SGRLVRTrainer

    script, train_cfg, model_args = parse_configs(
        (ScriptArgs, SGRLVRConfig, ModelArgs), argv
    )
    setup_distributed(model_args)
    cfg, params, processor, mesh = load_model_and_processor(model_args)

    rows = load_jsonl_dataset(script.dataset_name)
    if script.max_rows:
        rows = rows[: script.max_rows]
    map_data = load_cognitive_maps(script.cognitive_map_path)
    dataset = [{**r, **make_conversation(r, map_data)} for r in rows]

    trainer = SGRLVRTrainer(
        cfg, params, processor,
        get_reward_funcs(list(script.reward_funcs)),
        dataset, train_cfg, map_data=map_data, mesh=mesh,
    )
    trainer.train(resume_from_checkpoint=script.resume_from_checkpoint)
    trainer.save_checkpoint(train_cfg.output_dir + "/final")


if __name__ == "__main__":
    main()
