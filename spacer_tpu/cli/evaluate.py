"""Evaluation entry point (SpaceR-Eval/evaluate.py equivalent).

Example:
    python -m spacer_tpu.cli.evaluate --task VSI-Bench \
        --model_name_or_path /ckpts/SpaceR --data_root /data \
        --num_frames 32 --prompt_type thinking
"""

from __future__ import annotations

import json

from spacer_tpu.cli.common import (
    ModelArgs,
    load_model_and_processor,
    setup_distributed,
)
from spacer_tpu.utils.config import parse_configs


def main(argv=None):
    from spacer_tpu.evalharness import EvalConfig, QwenEngine, run_benchmark

    eval_cfg, model_args = parse_configs((EvalConfig, ModelArgs), argv)
    if eval_cfg.speculate_k and eval_cfg.serving != "continuous":
        # fail BEFORE the checkpoint load with a clear message
        raise SystemExit("--speculate_k requires --serving continuous")
    setup_distributed(model_args)
    cfg, params, processor, mesh = load_model_and_processor(model_args)
    engine = QwenEngine(cfg, params, processor,
                        decode_quant=model_args.decode_quant or None,
                        decode_impl=model_args.decode_impl or None,
                        speculate_k=eval_cfg.speculate_k)
    metrics = run_benchmark(eval_cfg, engine)
    print(json.dumps(metrics, indent=1, default=float))


if __name__ == "__main__":
    main()
