"""Benchmarks. Default: video preprocess + ViT encode throughput
(frames/sec/chip).  `python bench.py grpo` instead measures the full
SG-RLVR train-step throughput (samples/sec/chip) on a 1B-scale model.

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


def main_grpo():
    """GRPO train-step throughput: samples/sec/chip at reference shapes
    (G=8 completions of 1024 tokens over a video prompt) on a 1B-scale
    Qwen2.5-VL (structurally identical to the 7B; fits one v5e chip with
    optimizer state)."""
    import jax
    import jax.numpy as jnp

    from spacer_tpu.models.qwen25_vl.config import (
        Qwen25VLConfig, TextConfig, VisionConfig,
    )
    from spacer_tpu.models.qwen25_vl import init_params, get_rope_index
    from spacer_tpu.train import make_optimizer
    from spacer_tpu.train.step import make_grpo_train_step

    # ~1.3B params total: policy + ref + adam moments + transient grads is
    # five param copies, which must fit one 16G chip for this single-chip
    # bench (multi-chip runs shard instead). Structure (GQA, windowed ViT,
    # M-RoPE, remat, chunked logp) matches the 7B exactly.
    cfg = Qwen25VLConfig(
        text=TextConfig(
            vocab_size=49152, hidden_size=2048, intermediate_size=8192,
            num_layers=12, num_heads=16, num_kv_heads=4,
            mrope_section=(16, 24, 24),
        ),
        vision=VisionConfig(depth=8, fullatt_block_indexes=(3, 7),
                            out_hidden_size=2048),
    )
    params = jax.jit(
        lambda k: init_params(k, cfg, jnp.bfloat16)
    )(jax.random.key(0))
    jax.block_until_ready(params)
    ref_params = jax.tree.map(jnp.copy, params)
    tx = make_optimizer(learning_rate=1e-6, total_steps=1000)
    opt_state = tx.init(params)
    print("# init done", flush=True)

    G, P_len, C = 8, 2048, 1024
    T, H, W = 16, 224, 420
    grid = ((T // 2, H // 14, W // 14),)
    n_video = (grid[0][0] * grid[0][1] * grid[0][2]) // 4
    rng = np.random.default_rng(0)
    prompt = (
        [10] * (P_len - n_video - 2)
        + [cfg.vision_start_token_id]
        + [cfg.video_token_id] * n_video
        + [cfg.vision_end_token_id, 20]
    )[-P_len:]
    prompt_ids = np.array([prompt])
    prompt_mask = np.ones((1, P_len), np.int64)
    pos, deltas = get_rope_index(
        cfg, prompt_ids, video_grid_thw=np.array(grid),
        attention_mask=prompt_mask,
    )
    completion = rng.integers(10, 49000, size=(G, C))
    batch = {
        "input_ids": np.concatenate(
            [np.repeat(prompt_ids, G, 0), completion], 1
        ).astype(np.int32),
        "kv_mask": np.ones((G, P_len + C), bool),
        "position_ids": np.concatenate(
            [np.repeat(pos, G, 1),
             np.broadcast_to(
                 (deltas.reshape(-1, 1) + P_len + np.arange(C))[None],
                 (3, G, C))],
            2,
        ).astype(np.int32),
        "completion_mask": np.ones((G, C), np.int32),
        "advantages": rng.normal(size=(G,)).astype(np.float32),
        "pixel_values": rng.normal(
            size=((T // 2) * (H // 14) * (W // 14), cfg.vision.patch_dim)
        ).astype(np.float32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step = make_grpo_train_step(cfg, tx, beta=0.04, remat=True,
                                logp_chunk=256)
    params, opt_state, metrics = step(
        params, ref_params, opt_state, batch, grid_thw=grid,
        num_generations=G, prompt_len=P_len,
    )
    float(metrics["loss"])  # sync
    print("# compiled", flush=True)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, metrics = step(
            params, ref_params, opt_state, batch, grid_thw=grid,
            num_generations=G, prompt_len=P_len,
        )
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    sps = iters * G / dt
    print(json.dumps({
        "metric": "grpo_train_samples_per_sec_per_chip_1.3b",
        "value": round(sps, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(sps / 2.0, 3),  # nominal per-GPU reference rate
    }))


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "grpo":
        main_grpo()
    else:
        main()
