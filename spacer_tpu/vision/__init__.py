"""Video/image preprocessing with qwen-vl-utils parity semantics.

Reference behavior: SpaceR-SG-RLVR/src/qwen-vl-utils/src/qwen_vl_utils/vision_process.py.
The hot path here is host video decode (native FFmpeg / OpenCV) followed by an
on-device (jit) resize + normalize + patchify producing Qwen2.5-VL grid tokens.
"""

from spacer_tpu.vision.smart import (
    IMAGE_FACTOR,
    MIN_PIXELS,
    MAX_PIXELS,
    MAX_RATIO,
    VIDEO_MIN_PIXELS,
    VIDEO_MAX_PIXELS,
    FRAME_FACTOR,
    FPS,
    FPS_MIN_FRAMES,
    FPS_MAX_FRAMES,
    video_total_pixels,
    round_by_factor,
    ceil_by_factor,
    floor_by_factor,
    smart_resize,
    smart_nframes,
    video_frame_pixel_budget,
    sample_frame_indices,
)
from spacer_tpu.vision.process import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    patchify_frames,
    preprocess_frames,
    fetch_image,
    fetch_video,
    process_vision_info,
)

__all__ = [
    "IMAGE_FACTOR", "MIN_PIXELS", "MAX_PIXELS", "MAX_RATIO",
    "VIDEO_MIN_PIXELS", "VIDEO_MAX_PIXELS", "FRAME_FACTOR", "FPS",
    "FPS_MIN_FRAMES", "FPS_MAX_FRAMES", "video_total_pixels",
    "round_by_factor", "ceil_by_factor", "floor_by_factor",
    "smart_resize", "smart_nframes", "video_frame_pixel_budget",
    "sample_frame_indices",
    "OPENAI_CLIP_MEAN", "OPENAI_CLIP_STD",
    "patchify_frames", "preprocess_frames",
    "fetch_image", "fetch_video", "process_vision_info",
]
