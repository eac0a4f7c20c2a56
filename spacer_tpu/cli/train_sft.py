"""SFT entry point (sft.py equivalent)."""

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
    dataset_name: str = "dataset.jsonl"
    max_rows: Optional[int] = None


def main(argv=None):
    from spacer_tpu.data import load_jsonl_dataset
    from spacer_tpu.train.sft_trainer import SFTConfig, SFTTrainer

    script, train_cfg, model_args = parse_configs(
        (ScriptArgs, SFTConfig, ModelArgs), argv
    )
    setup_distributed(model_args)
    cfg, params, processor, mesh = load_model_and_processor(model_args)

    rows = load_jsonl_dataset(script.dataset_name)
    if script.max_rows:
        rows = rows[: script.max_rows]

    trainer = SFTTrainer(cfg, params, processor, rows, train_cfg, mesh=mesh)
    trainer.train()
    trainer.save_checkpoint(train_cfg.output_dir + "/final")


if __name__ == "__main__":
    main()
