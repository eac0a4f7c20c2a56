"""Dataset packaging: merge split archive parts, extract, and apply the
benchmark-leakage exclude list.

Behavioral reference: /root/reference/decompress.sh:1-36 (cat
SpaceR-151k.part_00..NN -> SpaceR-151k.tar.gz -> tar -xzf into the target
directory) and /root/reference/exclude_list.txt + README.md:36 (312
VSI-Bench scene mp4s removed from the training set to prevent data
leakage).

Usage:
  python tools/prepare_dataset.py merge --prefix SpaceR-151k.part_ \\
      --parts 10 --target-dir SpaceR-151k
  python tools/prepare_dataset.py exclude --dataset SpaceR-151k.jsonl \\
      --exclude-list exclude_list.txt --video-dir SpaceR-151k \\
      [--delete-videos]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tarfile


def merge_parts(prefix: str, total_parts: int, output_file: str | None = None,
                target_directory: str | None = None) -> str:
    """cat part_00..NN -> tar.gz -> extract (decompress.sh semantics: missing
    part aborts; extraction into target_directory)."""
    output_file = output_file or prefix.rstrip("_.") + ".tar.gz"
    target_directory = target_directory or prefix.split(".part")[0]
    os.makedirs(target_directory, exist_ok=True)
    with open(output_file, "wb") as out:
        for i in range(total_parts):
            part = f"{prefix}{i:02d}"
            if not os.path.isfile(part):
                raise FileNotFoundError(
                    f"part file {part} missing; merge aborted"
                )
            with open(part, "rb") as f:
                shutil.copyfileobj(f, out)
    with tarfile.open(output_file, "r:gz") as tar:
        tar.extractall(target_directory)
    return target_directory


def split_archive(archive: str, prefix: str, part_size: int) -> int:
    """Inverse of merge_parts (for producing release shards)."""
    n = 0
    with open(archive, "rb") as f:
        while True:
            chunk = f.read(part_size)
            if not chunk:
                break
            with open(f"{prefix}{n:02d}", "wb") as out:
                out.write(chunk)
            n += 1
    return n


def load_exclude_list(path: str) -> set[str]:
    """One video filename per line (exclude_list.txt format)."""
    with open(path) as f:
        return {line.strip() for line in f if line.strip()}


def apply_exclude_list(dataset_jsonl: str, exclude_list: str,
                       video_dir: str | None = None,
                       output_jsonl: str | None = None,
                       delete_videos: bool = False) -> dict:
    """Drop dataset rows whose video is on the exclude list (and optionally
    delete the mp4s), preventing VSI-Bench leakage (README.md:36)."""
    excluded = load_exclude_list(exclude_list)
    output_jsonl = output_jsonl or dataset_jsonl.replace(
        ".jsonl", ".filtered.jsonl"
    )
    kept = dropped = 0
    with open(dataset_jsonl) as fin, open(output_jsonl, "w") as fout:
        for line in fin:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            name = os.path.basename(str(row.get("path", "")))
            if name in excluded:
                dropped += 1
                continue
            fout.write(json.dumps(row) + "\n")
            kept += 1
    removed_files = 0
    if delete_videos and video_dir:
        for root, _, files in os.walk(video_dir):
            for fn in files:
                if fn in excluded:
                    os.remove(os.path.join(root, fn))
                    removed_files += 1
    return {
        "kept": kept, "dropped": dropped, "removed_files": removed_files,
        "output": output_jsonl,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    m = sub.add_parser("merge", help="merge split parts and extract")
    m.add_argument("--prefix", default="SpaceR-151k.part_")
    m.add_argument("--parts", type=int, default=10)
    m.add_argument("--output-file", default=None)
    m.add_argument("--target-dir", default=None)

    s = sub.add_parser("split", help="split an archive into parts")
    s.add_argument("--archive", required=True)
    s.add_argument("--prefix", required=True)
    s.add_argument("--part-size", type=int, default=2 * 1024**3)

    e = sub.add_parser("exclude", help="apply the leakage exclude list")
    e.add_argument("--dataset", required=True)
    e.add_argument("--exclude-list", required=True)
    e.add_argument("--video-dir", default=None)
    e.add_argument("--output", default=None)
    e.add_argument("--delete-videos", action="store_true")

    args = p.parse_args(argv)
    if args.cmd == "merge":
        out = merge_parts(args.prefix, args.parts, args.output_file,
                          args.target_dir)
        print(json.dumps({"target_directory": out}))
    elif args.cmd == "split":
        n = split_archive(args.archive, args.prefix, args.part_size)
        print(json.dumps({"parts": n}))
    else:
        print(json.dumps(apply_exclude_list(
            args.dataset, args.exclude_list, args.video_dir, args.output,
            args.delete_videos,
        )))


if __name__ == "__main__":
    main()
