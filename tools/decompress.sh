#!/usr/bin/env bash
# Reassemble and extract the SpaceR-151k dataset shards
# (reference parity: decompress.sh — merge SpaceR-151k.part_00..09 into a
# tar.gz, then extract).
set -euo pipefail

prefix="${PREFIX:-SpaceR-151k.part_}"
total_parts="${TOTAL_PARTS:-10}"
output_file="${OUTPUT:-SpaceR-151k.tar.gz}"
target_directory="${TARGET:-SpaceR-151k}"

mkdir -p "$target_directory"

echo "merging ${total_parts} shard(s)..."
: > "$output_file"
for ((i = 0; i < total_parts; i++)); do
    part_file="$(printf '%s%02d' "$prefix" "$i")"
    if [[ ! -f "$part_file" ]]; then
        echo "missing shard: $part_file" >&2
        exit 1
    fi
    cat "$part_file" >> "$output_file"
done
echo "merged -> $output_file"

echo "extracting into $target_directory"
tar -xzf "$output_file" -C "$target_directory"
echo "done"
