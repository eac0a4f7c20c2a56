#!/usr/bin/env bash
# SFT launch (reference parity: run_SpaceR_SFT.sh).
set -euo pipefail

python -m spacer_tpu.cli.train_sft \
    --output_dir "output/SpaceR-SFT" \
    --model_name_or_path "${MODEL:-checkpoints/Qwen2.5-VL-7B-Instruct}" \
    --dataset_name "${DATASET:-sft_data.jsonl}" \
    --learning_rate 1e-5 \
    --num_train_epochs 1 \
    --save_steps 1000 \
    "$@"
