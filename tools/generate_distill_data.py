"""Sample generations from an OpenAI-compatible server for distillation data
(reference parity: open_r1/generate.py's distilabel pipeline, without the
distilabel/ray dependency)."""

from __future__ import annotations

import argparse
import json
from concurrent.futures import ThreadPoolExecutor


def generate_rows(client, model: str, prompts, *, temperature=None,
                  top_p=None, max_new_tokens=8192, num_generations=1,
                  workers=16):
    kwargs = {"max_tokens": max_new_tokens, "n": num_generations}
    if temperature is not None:
        kwargs["temperature"] = temperature
    if top_p is not None:
        kwargs["top_p"] = top_p

    def one(prompt):
        resp = client.chat.completions.create(
            model=model,
            messages=[{"role": "user", "content": prompt}],
            **kwargs,
        )
        return {
            "instruction": prompt,
            "generations": [c.message.content for c in resp.choices],
        }

    with ThreadPoolExecutor(workers) as pool:
        return list(pool.map(one, prompts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="jsonl with a prompt column")
    ap.add_argument("--prompt-column", default="prompt")
    ap.add_argument("--output", required=True)
    ap.add_argument("--model", required=True)
    ap.add_argument("--base-url", default="http://localhost:8000/v1")
    ap.add_argument("--temperature", type=float, default=None)
    ap.add_argument("--top-p", type=float, default=None)
    ap.add_argument("--max-new-tokens", type=int, default=8192)
    ap.add_argument("--num-generations", type=int, default=1)
    args = ap.parse_args()

    from openai import OpenAI

    client = OpenAI(base_url=args.base_url, api_key="EMPTY")
    prompts = [
        json.loads(l)[args.prompt_column] for l in open(args.input)
    ]
    rows = generate_rows(
        client, args.model, prompts, temperature=args.temperature,
        top_p=args.top_p, max_new_tokens=args.max_new_tokens,
        num_generations=args.num_generations,
    )
    with open(args.output, "w") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")


if __name__ == "__main__":
    main()
