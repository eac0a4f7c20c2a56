"""Convert locally-generated CoT rows into the SpaceR-151k training schema
(reference parity: local_scripts/prepare_hf_data.py): one jsonl row per
sample with problem / problem_type / options / solution / path / data_type /
data_source / problem_id columns."""

from __future__ import annotations

import argparse
import json


def to_training_row(row: dict, idx: int) -> dict:
    problem_type = row.get("problem_type", "free-form")
    return {
        "problem_id": row.get("problem_id", idx),
        "problem": row["problem"],
        "problem_type": problem_type,
        "options": row.get("options", []) if problem_type == "multiple choice" else [],
        "solution": row["solution"],
        "path": row.get("path", row.get("video", row.get("image", ""))),
        "data_type": row.get("data_type", "video" if row.get("video") else "image"),
        "data_source": row.get("data_source", "generated"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()
    rows = [json.loads(l) for l in open(args.input)]
    with open(args.output, "w") as f:
        for i, r in enumerate(rows):
            f.write(json.dumps(to_training_row(r, i), ensure_ascii=False) + "\n")
    print(f"wrote {len(rows)} rows to {args.output}")


if __name__ == "__main__":
    main()
