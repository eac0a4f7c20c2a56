"""Rewrite (question, answer) pairs into CoT-style training rows with an
OpenAI-compatible LLM (reference parity: local_scripts/create_vision_cot_data.py,
which used AzureOpenAI + GPT-4o).

Offline-friendly: the API client is injected, so the transform/parse logic is
testable without network access.  Point --base_url at any OpenAI-compatible
server (e.g. a locally-served model).
"""

from __future__ import annotations

import argparse
import base64
import json
import re
from concurrent.futures import ThreadPoolExecutor
from io import BytesIO

PROMPT_FORMAT = """I will provide you with an image, an original question, and its answer related to the image. Your task is to rewrite the question in such a way that answering it requires step-by-step Chain-of-Thought (CoT) reasoning with numerical or mathematical expressions where applicable. The reasoning process can include expressions like "let me think," "oh, I see," or other natural language thought expressions.

Please make sure your question is to ask for a certain answer with a certain value, do not ask for open-ended answer, and the answer is correct and easy to verify via simple protocol, like "2" or "A".

Please strictly do not include "Answer:" in the question part to avoid confusion and leakage.

Input Format:
Original Question: {original_question}
Original Answer: {original_answer}

Output Format:
Question: [rewrite the question if necessary]
Answer: [answer with reasoning steps, including calculations where applicable]
<think>step-by-step reasoning process</think>
<answer>easy to verify answer</answer>
"""


def image_to_data_url(path: str) -> str:
    from PIL import Image

    img = Image.open(path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    buf = BytesIO()
    img.save(buf, format="JPEG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    return f"data:image/jpeg;base64,{b64}"


def parse_cot_response(text: str) -> dict | None:
    """Extract the rewritten question / reasoning / answer from the model
    output; None when the response does not follow the format."""
    q = re.search(r"Question:\s*(.*?)\n\s*Answer:", text, re.DOTALL)
    think = re.search(r"<think>(.*?)</think>", text, re.DOTALL)
    ans = re.search(r"<answer>(.*?)</answer>", text, re.DOTALL)
    if not (q and think and ans):
        return None
    return {
        "problem": q.group(1).strip(),
        "solution": (
            f"<think>{think.group(1).strip()}</think>"
            f"<answer>{ans.group(1).strip()}</answer>"
        ),
    }


def rewrite_row(client, model: str, row: dict) -> dict | None:
    content = [
        {"type": "text", "text": PROMPT_FORMAT.format(
            original_question=row["problem"],
            original_answer=row["solution"],
        )},
    ]
    if row.get("image"):
        content.insert(0, {
            "type": "image_url",
            "image_url": {"url": image_to_data_url(row["image"])},
        })
    resp = client.chat.completions.create(
        model=model,
        messages=[{"role": "user", "content": content}],
        max_tokens=1024,
    )
    parsed = parse_cot_response(resp.choices[0].message.content)
    if parsed is None:
        return None
    return {**row, **parsed}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="jsonl with problem/solution/image rows")
    ap.add_argument("--output", required=True)
    ap.add_argument("--model", default="gpt-4o")
    ap.add_argument("--base_url", default=None,
                    help="OpenAI-compatible endpoint (no egress by default)")
    ap.add_argument("--api_key", default="EMPTY")
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    from openai import OpenAI  # optional dependency, only needed here

    client = OpenAI(base_url=args.base_url, api_key=args.api_key)
    rows = [json.loads(l) for l in open(args.input)]
    with ThreadPoolExecutor(args.workers) as pool:
        results = list(pool.map(
            lambda r: rewrite_row(client, args.model, r), rows
        ))
    with open(args.output, "w") as f:
        for r in results:
            if r is not None:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")


if __name__ == "__main__":
    main()
