"""Golden tests for frame-count/resolution scheduling (qwen-vl-utils parity).

Golden values were produced by executing the reference scheduling functions
(vision_process.py:61-87, 145-182) on the cases below.
"""

import pytest

from spacer_tpu.vision import smart_resize, smart_nframes, video_frame_pixel_budget

# (height, width, factor, min_pixels, max_pixels) -> (h_bar, w_bar)
RESIZE_GOLDEN = [
    (480, 640, 28, None, None, (364, 504)),
    (1080, 1920, 28, None, None, (336, 588)),
    (360, 640, 28, 100352, 100352, (224, 420)),
    (224, 224, 28, 3136, 200704, (224, 224)),
    (719, 1281, 28, 3136, 401408, (448, 840)),
    (28, 28, 28, None, None, (56, 56)),
    (1000, 333, 28, 3136, 12845056, (1008, 336)),
]

# (ele, total_frames, video_fps) -> nframes
NFRAMES_GOLDEN = [
    ({}, 300, 30.0, 16),
    ({}, 9000, 29.97, 16),
    ({"nframes": 10}, 100, 30, 10),
    ({"fps": 1.0}, 120, 24.0, 4),
    ({}, 5, 15.0, 4),
    ({"fps": 1.0, "max_frames": 32}, 3000, 30.0, 32),
    ({}, 60, 29.5, 4),
    ({"fps": 1.0, "min_frames": 4, "max_frames": 768}, 201, 25.0, 8),
]


@pytest.mark.parametrize("h,w,f,mn,mx,expected", RESIZE_GOLDEN)
def test_smart_resize_golden(h, w, f, mn, mx, expected):
    kwargs = {}
    if mn is not None:
        kwargs["min_pixels"] = mn
    if mx is not None:
        kwargs["max_pixels"] = mx
    assert smart_resize(h, w, factor=f, **kwargs) == expected


def test_smart_resize_matches_hf_processor():
    """Independent oracle: the HF Qwen2VL image processor's smart_resize.

    Note: the SpaceR-vendored smart_resize (our parity target) does NOT clamp
    to `factor` in the shrink branch, unlike transformers>=4.5x, so they
    diverge for degenerate aspect ratios (one dim floors to 0). Realistic
    dims (ratio <= 20) agree exactly.
    """
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        smart_resize as hf_smart_resize,
    )

    import random

    rng = random.Random(0)
    for _ in range(200):
        h = rng.randint(28, 2160)
        w = rng.randint(28, 3840)
        if max(h, w) / min(h, w) > 20:
            continue
        for mn, mx in [(3136, 12845056), (100352, 100352), (3136, 401408)]:
            assert smart_resize(h, w, 28, mn, mx) == hf_smart_resize(h, w, 28, mn, mx)


@pytest.mark.parametrize("ele,tf,fps,expected", NFRAMES_GOLDEN)
def test_smart_nframes_golden(ele, tf, fps, expected):
    assert smart_nframes(ele, total_frames=tf, video_fps=fps) == expected


def test_smart_nframes_rejects_both_keys():
    with pytest.raises(AssertionError):
        smart_nframes({"fps": 2.0, "nframes": 8}, total_frames=100, video_fps=30.0)


def test_smart_resize_aspect_guard():
    with pytest.raises(ValueError):
        smart_resize(10000, 28)


def test_video_frame_pixel_budget():
    # SpaceR pins VIDEO_MIN==VIDEO_MAX==128*28^2, so the 1.05*min floor is the
    # binding value: max(min(100352, total/16*2), int(1.05*100352)) = 105369.
    mn, mx = video_frame_pixel_budget(16)
    assert mn == 128 * 28 * 28
    assert mx == int(128 * 28 * 28 * 1.05)
    # user-supplied cap below the schedule wins
    mn, mx = video_frame_pixel_budget(16, max_pixels_supposed=50000)
    assert mx == 50000
