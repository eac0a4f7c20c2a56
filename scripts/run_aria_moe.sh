#!/usr/bin/env bash
# Aria-MoE GRPO training launch (reference parity: the role of
# local_scripts/train_aria_moe.sh — plain-DP GRPO on rhymes-ai/Aria,
# max_prompt 8192, bs 1/device, 1 epoch).  TPU-native: one process per
# host; expert parallelism rides the mesh's ep axis (parallel/expert.py),
# replacing the reference's NCCL/torchrun plumbing.
set -euo pipefail

export TOKENIZERS_PARALLELISM=false
export DEBUG_MODE="${DEBUG_MODE:-false}"
export LOG_PATH="${LOG_PATH:-./debug_log_aria.txt}"

python -m spacer_tpu.cli.train_grpo \
    --output_dir "output/Aria-GRPO-mini_cot_80k" \
    --model_name_or_path "${MODEL:-checkpoints/Aria}" \
    --model_family aria \
    --dataset_name "${DATASET:-mini_cot_80k.jsonl}" \
    --max_prompt_length 8192 \
    --gradient_accumulation_steps 1 \
    --logging_steps 1 \
    --num_train_epochs 1 \
    --save_steps 1000 \
    "$@"
