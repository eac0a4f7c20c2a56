"""Dataset packaging tool (decompress.sh + exclude_list.txt equivalents) and
the sparbench lenient-match empty-prediction quirk."""

import json
import os
import tarfile

import pytest


def test_merge_parts_roundtrip(tmp_path):
    from tools.prepare_dataset import merge_parts, split_archive

    payload = tmp_path / "data"
    payload.mkdir()
    (payload / "a.txt").write_text("hello")
    (payload / "b.txt").write_text("world" * 1000)
    archive = tmp_path / "ds.tar.gz"
    with tarfile.open(archive, "w:gz") as tar:
        tar.add(payload / "a.txt", arcname="a.txt")
        tar.add(payload / "b.txt", arcname="b.txt")

    prefix = str(tmp_path / "ds.part_")
    n = split_archive(str(archive), prefix, part_size=128)
    assert n >= 2

    target = merge_parts(prefix, n, str(tmp_path / "merged.tar.gz"),
                         str(tmp_path / "out"))
    assert open(os.path.join(target, "a.txt")).read() == "hello"
    assert open(os.path.join(target, "b.txt")).read() == "world" * 1000

    # missing part aborts (decompress.sh:19-21)
    with pytest.raises(FileNotFoundError):
        merge_parts(prefix, n + 1, str(tmp_path / "m2.tar.gz"),
                    str(tmp_path / "out2"))


def test_apply_exclude_list(tmp_path):
    from tools.prepare_dataset import apply_exclude_list

    rows = [
        {"problem_id": 0, "path": "videos/scene0001_00.mp4"},
        {"problem_id": 1, "path": "videos/scene0002_00.mp4"},
        {"problem_id": 2, "path": "videos/keepme.mp4"},
    ]
    ds = tmp_path / "ds.jsonl"
    ds.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    ex = tmp_path / "exclude_list.txt"
    ex.write_text("scene0001_00.mp4\nscene0002_00.mp4\n")
    vdir = tmp_path / "videos"
    vdir.mkdir()
    for r in rows:
        (vdir / os.path.basename(r["path"])).write_bytes(b"x")

    stats = apply_exclude_list(str(ds), str(ex), str(vdir),
                               delete_videos=True)
    assert stats["kept"] == 1 and stats["dropped"] == 2
    assert stats["removed_files"] == 2
    kept = [json.loads(l) for l in open(stats["output"])]
    assert kept[0]["problem_id"] == 2
    assert sorted(os.listdir(vdir)) == ["keepme.mp4"]


def test_exact_match_lenient_empty_pred_is_reference_quirk():
    """'' as a prediction scores 1.0 because '' is a substring of every
    target (spar_util.py:212-223 behavior, reproduced deliberately); the
    pred[0] IndexError is unreachable since the substring branch catches
    the only zero-length case. Degrade-path '' answers therefore never
    crash the scorer."""
    from spacer_tpu.evalharness.benchmarks.sparbench import (
        exact_match_lenient,
    )

    assert exact_match_lenient("", "a") == 1.0
    assert exact_match_lenient("", "") == 1.0
    assert exact_match_lenient("a", "a") == 1.0
    assert exact_match_lenient("a", "ab") == 1.0  # substring
    assert exact_match_lenient("b", "a") == 0.0
