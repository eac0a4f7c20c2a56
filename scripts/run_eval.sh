#!/usr/bin/env bash
# Multi-benchmark evaluation launch (reference parity: SpaceR-Eval/evaluate.py
# __main__ constants; see spacer_tpu/evalharness/runner.py EvalConfig).
set -euo pipefail

TASK="${TASK:-VSI-Bench}"   # VSI-Bench STI-Bench SPAR-Bench Video-MME LongVideoBench TempCompass

python -m spacer_tpu.cli.evaluate \
    --task "$TASK" \
    --model_name_or_path "${MODEL:-checkpoints/SpaceR}" \
    --data_root "${DATA_ROOT:-.}" \
    --output_dir "eval_output/${TASK}" \
    --num_frames 32 \
    --fps 1 \
    --target_resolution 448,448 \
    --prompt_type thinking \
    --batch_size 1 \
    "$@"
