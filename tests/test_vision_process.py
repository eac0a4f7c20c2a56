"""Patchify / preprocessing parity vs the HF Qwen2VL image processor."""

import numpy as np
import pytest

from spacer_tpu.vision import patchify_frames, preprocess_frames
from spacer_tpu.vision.process import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    _resize_normalize_patchify,
)


def _hf_processor():
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor,
    )

    return Qwen2VLImageProcessor(
        min_pixels=56 * 56, max_pixels=12845056, patch_size=14,
        temporal_patch_size=2, merge_size=2,
    )


def test_patchify_flatten_order_matches_hf():
    """Same normalized frames through our patchify vs the HF reshape chain."""
    rng = np.random.default_rng(0)
    T, C, H, W = 4, 3, 56, 84
    frames = rng.normal(size=(T, C, H, W)).astype(np.float32)

    ours, grid = patchify_frames(frames)
    assert grid == (2, 4, 6)
    assert ours.shape == (2 * 4 * 6, 3 * 2 * 14 * 14)

    # HF reference flatten chain (image_processing_qwen2_vl.py:278-295)
    patches = frames.reshape(2, 2, 3, 2, 2, 14, 3, 2, 14)
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    theirs = patches.reshape(2 * 4 * 6, 3 * 2 * 14 * 14)
    np.testing.assert_array_equal(ours, theirs)


def test_patchify_pads_odd_temporal():
    rng = np.random.default_rng(1)
    frames = rng.normal(size=(3, 3, 28, 28)).astype(np.float32)
    flat, grid = patchify_frames(frames)
    assert grid == (2, 2, 2)
    # last temporal slot repeats frame 2
    frames4 = np.concatenate([frames, frames[-1:]], axis=0)
    flat2, _ = patchify_frames(frames4)
    np.testing.assert_array_equal(flat, flat2)


def test_preprocess_frames_vs_hf_end_to_end():
    """uint8 frames at an already-aligned size: our jit pipeline must match the
    HF processor output (no resize ambiguity)."""
    rng = np.random.default_rng(2)
    T, H, W = 4, 112, 140
    frames = rng.integers(0, 256, size=(T, H, W, 3), dtype=np.uint8)

    proc = _hf_processor()
    out = proc(images=None, videos=[list(frames)], return_tensors="np")
    hf_pixels = out["pixel_values_videos"]
    hf_grid = tuple(out["video_grid_thw"][0].tolist())

    ours, grid = preprocess_frames(frames, min_pixels=56 * 56, max_pixels=12845056)
    assert grid == hf_grid
    np.testing.assert_allclose(ours, hf_pixels, rtol=0, atol=2e-3)

    ours_np, grid_np = preprocess_frames(
        frames, min_pixels=56 * 56, max_pixels=12845056, device=False
    )
    assert grid_np == hf_grid
    np.testing.assert_allclose(ours_np, hf_pixels, rtol=0, atol=2e-3)


def test_preprocess_frames_resize_close_to_hf():
    """With an actual resize, jax bicubic-antialias vs PIL bicubic should agree
    to small tolerance in normalized units."""
    rng = np.random.default_rng(3)
    # smooth image so resampling-filter differences stay small
    base = rng.normal(size=(8, 10, 3))
    import jax
    import jax.numpy as jnp

    img = np.asarray(
        jax.image.resize(jnp.asarray(base), (240, 320, 3), "linear")
    )
    img = ((img - img.min()) / (img.max() - img.min()) * 255).astype(np.uint8)
    frames = np.stack([img, img])

    proc = _hf_processor()
    out = proc(images=None, videos=[list(frames)], return_tensors="np")
    hf_pixels = out["pixel_values_videos"]
    hf_grid = tuple(out["video_grid_thw"][0].tolist())

    ours, grid = preprocess_frames(frames, min_pixels=56 * 56, max_pixels=12845056)
    assert grid == hf_grid
    assert ours.shape == hf_pixels.shape
    # normalized units: CLIP std ~0.27 so 0.05 ~= 1.3/255 raw pixel levels
    err = np.abs(ours - hf_pixels)
    assert np.quantile(err, 0.99) < 0.08, np.quantile(err, 0.99)
    assert err.mean() < 0.02, err.mean()


def test_fetch_image_http_url():
    """http(s) URL branch (vision_process.py:108-110) against a local
    server — no external egress needed."""
    import http.server
    import threading
    from io import BytesIO

    import numpy as np
    from PIL import Image

    from spacer_tpu.vision.process import fetch_image

    img = Image.fromarray(
        np.random.default_rng(3).integers(0, 255, (56, 84, 3), np.uint8)
    )
    buf = BytesIO()
    img.save(buf, format="PNG")
    payload = buf.getvalue()

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/img.png"
        out = fetch_image({"image": url})
        ref = fetch_image({"image": img})
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    finally:
        srv.shutdown()
