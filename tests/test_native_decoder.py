"""Native FFmpeg decoder: parity with the OpenCV fallback path."""

import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
LIB = os.path.join(NATIVE_DIR, "libspacer_video.so")


@pytest.fixture(scope="module")
def lib_path():
    if not os.path.exists(LIB):
        rc = subprocess.run(["make", "-C", NATIVE_DIR], capture_output=True)
        if rc.returncode != 0 or not os.path.exists(LIB):
            pytest.skip("native decoder not buildable here")
    return LIB


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (320, 240))
    rng = np.random.default_rng(0)
    frames = []
    for t in range(50):
        f = np.zeros((240, 320, 3), np.uint8)
        f[:, :, 0] = (t * 5) % 256  # blue channel encodes the frame index
        f[50:90, 50:90] = rng.integers(0, 255, (40, 40, 3), np.uint8)
        frames.append(f)
        w.write(f)
    w.release()
    return path, frames


def test_probe(lib_path, clip):
    from spacer_tpu.vision.native_decoder import NativeDecoder

    path, frames = clip
    dec = NativeDecoder(lib_path)
    total, fps = dec.probe(path)
    assert total == 50
    assert fps == pytest.approx(25.0, abs=0.1)
    info = dec.probe_full(path)
    assert (info.width, info.height) == (320, 240)


def test_read_frames_matches_opencv(lib_path, clip):
    from spacer_tpu.vision.native_decoder import NativeDecoder
    from spacer_tpu.vision.reader import _read_video_opencv

    path, _ = clip
    dec = NativeDecoder(lib_path)
    idx = [0, 7, 7, 23, 49]
    native = dec.read_frames(path, idx)
    assert native.shape == (5, 240, 320, 3)
    # same frames via sequential opencv decode
    import cv2

    cap = cv2.VideoCapture(path)
    ocv = {}
    pos = 0
    while pos <= 49:
        ok, f = cap.read()
        if not ok:
            break
        if pos in set(idx):
            ocv[pos] = cv2.cvtColor(f, cv2.COLOR_BGR2RGB)
        pos += 1
    cap.release()
    for row, i in zip(native, idx):
        # identical decoders modulo yuv->rgb rounding
        diff = np.abs(row.astype(int) - ocv[i].astype(int))
        assert diff.mean() < 2.0, (i, diff.mean())


def test_reader_backend_selection(lib_path, clip, monkeypatch):
    from spacer_tpu.vision import reader

    path, _ = clip
    monkeypatch.setenv("SPACER_VIDEO_READER", "native")
    reader.get_video_reader_backend.cache_clear()
    reader._load_native.cache_clear()
    monkeypatch.setattr(reader, "_native_lib_path", lambda: lib_path)
    frames, fps = reader.read_video({"video": path, "nframes": 4})
    assert frames.shape == (4, 240, 320, 3)
    reader.get_video_reader_backend.cache_clear()


def test_video_start_end_clip_window(clip):
    """video_start/video_end seconds clip the sampled range in BOTH backends
    (reference contract: torchvision read_video start_pts/end_pts,
    vision_process.py:206-209)."""
    from spacer_tpu.vision.reader import (
        _clip_range,
        _read_video_native,
        _read_video_opencv,
    )

    path, frames = clip  # 50 frames @ 25 fps = 2s; blue channel = (i*5)%256

    # frames with 0.6 <= i/25 <= 1.4  ->  i in [15, 35], 21 frames
    first, n = _clip_range(
        {"video_start": 0.6, "video_end": 1.4}, 50, 25.0
    )
    assert (first, n) == (15, 21)

    ele = {"video": path, "video_start": 0.6, "video_end": 1.4, "fps": 25.0}
    out_cv, fps_cv = _read_video_opencv(dict(ele))
    # fps=25 over a 0.84s window asks for ~21 frames -> clamped/factored
    assert out_cv.shape[0] >= 4
    # every sampled frame must come from inside the window
    blues = out_cv[:, 0, 0, 2].astype(int)  # RGB: blue is channel 2
    lo, hi = (15 * 5) % 256, (35 * 5) % 256
    assert blues.min() >= lo - 12 and blues.max() <= hi + 12

    if os.path.exists(LIB):
        out_nat, fps_nat = _read_video_native(dict(ele))
        assert out_nat.shape == out_cv.shape
        assert fps_nat == pytest.approx(fps_cv)
        np.testing.assert_array_equal(
            out_nat[:, 0, 0, 2], out_cv[:, 0, 0, 2]
        )

    # empty window raises
    with pytest.raises(ValueError):
        _clip_range({"video_start": 3.0, "video_end": 3.5}, 50, 25.0)
