#!/usr/bin/env bash
# Plain video-GRPO launch (reference parity: run_grpo_video.sh).
set -euo pipefail

export DEBUG_MODE="${DEBUG_MODE:-false}"
export LOG_PATH="${LOG_PATH:-./debug_log_grpo.txt}"

python -m spacer_tpu.cli.train_grpo \
    --output_dir "output/GRPO-Video" \
    --model_name_or_path "${MODEL:-checkpoints/Qwen2.5-VL-7B-Instruct}" \
    --dataset_name "${DATASET:-video_data.jsonl}" \
    --max_prompt_length 16384 \
    --max_completion_length 1024 \
    --learning_rate 1e-6 \
    --temporal true \
    --len_control true \
    --num_generations 8 \
    "$@"
