"""Benchmark: video preprocess + ViT encode throughput (frames/sec/chip).

Measures the production hot path for both training rollouts and eval: uint8
decoded frames -> fused resize/normalize/patchify (jit) -> full-scale
Qwen2.5-VL vision tower (670M params, bf16, windowed attention) -> merged
LM-space embeddings.  Shapes follow the SpaceR training schedule: 16 frames
at the 105369 px/frame budget (vision_process.py:288-295), i.e. 224x420 ->
grid (8, 16, 30) = 3840 patch tokens per clip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no machine throughput numbers (BASELINE.md), so
vs_baseline is reported against a nominal 160 frames/sec/GPU figure for the
reference stack's preprocess+encode path on its 8xGPU node (estimate).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from spacer_tpu.models.qwen25_vl.config import QWEN25_VL_7B
    from spacer_tpu.models.qwen25_vl.vision import (
        init_vit_params, vision_layout, vit_forward,
    )
    from spacer_tpu.vision.process import _resize_normalize_patchify
    from spacer_tpu.vision.smart import smart_resize

    cfg = QWEN25_VL_7B.vision
    T, H, W = 16, 360, 640
    out_h, out_w = smart_resize(H, W, 28, 100352, 105369)
    grid = ((T // 2, out_h // 14, out_w // 14),)
    layout = vision_layout(grid, cfg)

    # one compiled program for the whole init: a python-level init would pay
    # one host->device round trip per tensor (minutes over a TPU tunnel)
    params = jax.jit(lambda k: init_vit_params(k, cfg, jnp.bfloat16))(
        jax.random.key(0)
    )
    jax.block_until_ready(params)
    print("# init done", flush=True)

    @jax.jit
    def pipeline(params, frames):
        patches = _resize_normalize_patchify(frames, out_h, out_w)
        out = vit_forward(params, cfg, patches.astype(jnp.bfloat16), layout)
        # scalar checksum: fetching it to host is the only reliable sync on
        # remote-relay PJRT backends (block_until_ready returns early there)
        return out, out.sum()

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(T, H, W, 3), dtype=np.uint8)

    # warmup (compile) — float() forces a device-to-host sync
    float(pipeline(params, jnp.asarray(frames))[1])
    float(pipeline(params, jnp.asarray(frames))[1])

    iters = 20
    dev_frames = jnp.asarray(frames)
    t0 = time.perf_counter()
    for _ in range(iters):
        out, checksum = pipeline(params, dev_frames)
    float(checksum)
    dt = time.perf_counter() - t0
    fps = iters * T / dt

    baseline_fps = 160.0  # nominal reference per-GPU preprocess+encode rate
    print(json.dumps({
        "metric": "video_preprocess_encode_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
