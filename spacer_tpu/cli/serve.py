"""Offline batch serving entry point (the vLLM-engine role, file in/out).

Reads prompts from a jsonl file, streams them through the
continuous-batching engine (serving/batcher.py via
QwenEngine.generate_many), and writes completions jsonl.  This covers the
serving role vLLM plays around the reference — the central rollout engine
of vllm_grpo_trainer_modified.py:359-384 and the OpenAI-compatible server
tools/generate_distill_data.py talks to — as a zero-egress batch path.

Input rows are either chat-format:
    {"messages": [{"role": "user", "content": [...]}], ...}
or shorthand:
    {"prompt": "text", "video": "/path.mp4"?, "image": "/path.png"?, ...}

Each output row is the input row plus a "completion" field.

Example:
    python -m spacer_tpu.cli.serve --input_file prompts.jsonl \
        --model_name_or_path /ckpts/SpaceR --slots 8 \
        --max_new_tokens 1024 --temperature 0.7 --top_p 0.95
"""

from __future__ import annotations

import dataclasses
import json

from spacer_tpu.cli.common import (
    ModelArgs,
    load_model_and_processor,
    setup_distributed,
)
from spacer_tpu.utils.config import parse_configs


@dataclasses.dataclass
class ServeConfig:
    input_file: str = ""
    output_file: str = "completions.jsonl"
    max_new_tokens: int = 128
    temperature: float = 0.01
    top_p: float = 1.0
    slots: int = 4
    chunk_steps: int = 32
    # rows per generate_many call (bounds host-side frame memory);
    # 0 = 8 * slots
    wave_size: int = 0
    serving: str = "continuous"   # "continuous" | "static"
    # --http: run the OpenAI-compatible online server (serving/server.py)
    # instead of the file-in/file-out batch path
    http: bool = False
    host: str = "127.0.0.1"
    port: int = 8000
    prompt_len: int = 1024        # http mode: the deployment prompt bucket
    # prompt-lookup speculative decoding: draft tokens verified per step
    # (serving/speculative.py); greedy at temperature 0, exact rejection
    # sampling otherwise
    speculate_k: int = 0


def _row_to_messages(row: dict) -> list:
    if "messages" in row:
        return row["messages"]
    content = []
    if row.get("video"):
        content.append({"type": "video", "video": row["video"]})
    if row.get("image"):
        content.append({"type": "image", "image": row["image"]})
    content.append({"type": "text", "text": row.get("prompt", "")})
    return [{"role": "user", "content": content}]


def main(argv=None):
    from spacer_tpu.evalharness import QwenEngine

    serve_cfg, model_args = parse_configs((ServeConfig, ModelArgs), argv)
    if not serve_cfg.http and not serve_cfg.input_file:
        raise SystemExit("--input_file is required (or pass --http)")
    if serve_cfg.speculate_k:
        # fail BEFORE the (minutes-long) checkpoint load, not on wave 1
        if not serve_cfg.http and serve_cfg.serving != "continuous":
            raise SystemExit(
                "--speculate_k requires --serving continuous (the static "
                "grouped sampler has no speculative path)")
    setup_distributed(model_args)
    cfg, params, processor, mesh = load_model_and_processor(model_args)

    if serve_cfg.http:
        from spacer_tpu.serving import OpenAIServer

        server = OpenAIServer(
            cfg, params, processor,
            model_name=model_args.model_name_or_path or "spacer",
            slots=serve_cfg.slots, prompt_len=serve_cfg.prompt_len,
            max_new_tokens=serve_cfg.max_new_tokens,
            temperature=serve_cfg.temperature, top_p=serve_cfg.top_p,
            chunk_steps=serve_cfg.chunk_steps,
            decode_quant=model_args.decode_quant or None,
            decode_impl=model_args.decode_impl or None,
            speculate_k=serve_cfg.speculate_k,
        )
        print(f"serving {model_args.model_name_or_path or 'model'} on "
              f"http://{serve_cfg.host}:{serve_cfg.port}/v1", flush=True)
        server.serve_forever(serve_cfg.host, serve_cfg.port)
        return
    engine = QwenEngine(cfg, params, processor, top_p=serve_cfg.top_p,
                        decode_quant=model_args.decode_quant or None,
                        decode_impl=model_args.decode_impl or None,
                        speculate_k=serve_cfg.speculate_k)

    with open(serve_cfg.input_file) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    wave = serve_cfg.wave_size or serve_cfg.slots * 8
    continuous = serve_cfg.serving == "continuous"

    n = 0
    with open(serve_cfg.output_file, "w") as out:
        for start in range(0, len(rows), wave):
            batch = rows[start:start + wave]
            messages = [_row_to_messages(r) for r in batch]
            if continuous:
                texts = engine.generate_many(
                    messages, max_new_tokens=serve_cfg.max_new_tokens,
                    temperature=serve_cfg.temperature,
                    slots=serve_cfg.slots,
                    chunk_steps=serve_cfg.chunk_steps,
                )
            else:
                texts = engine.generate(
                    messages, max_new_tokens=serve_cfg.max_new_tokens,
                    temperature=serve_cfg.temperature,
                )
            for row, text in zip(batch, texts):
                out.write(json.dumps({**row, "completion": text}) + "\n")
                n += 1
    print(f"wrote {n} completions to {serve_cfg.output_file}")
    return serve_cfg.output_file


if __name__ == "__main__":
    main()
