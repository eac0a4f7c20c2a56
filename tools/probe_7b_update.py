"""7B update-phase probe on ONE v5e chip (VERDICT r4 #7).

A full single-chip 7B GRPO update is arithmetically infeasible: bf16
policy params alone are 15.2 GiB of the 15.75 GiB HBM, and the update's
value_and_grad must hold params + a same-shaped grads tree (30.4 GiB)
before activations — no remat policy or moment quantization changes that.
(The deployment answer is the fsdp mesh: dryrun_multichip shards exactly
this step over 8 devices, and tests/test_7b_dress_rehearsal.py executes it
at true 7B geometry on the virtual mesh.)

What CAN be measured on the one real chip is the update at TRUE 7B layer
geometry — full 3584 hidden / 18944 intermediate / 152k-vocab head, real
M-RoPE/GQA shapes, the shipped shared-prefix schema and logp chunking —
at reduced LAYER COUNTS.  Decoder layers are homogeneous, so
t(L) = a + b*L fits the measured points and t(28) is a one-parameter
extrapolation anchored by true-shape measurements (the vocab-head and
vision terms are measured at full size inside `a`).

Setup mirrors the headline bench: G=8 completions of C tokens over a 2048
video prompt, dots_narrow remat, int8 moments, beta=0.04 with the ref
forward measured separately via ref_logps_fn on the SAME param tree (at
step 0 ref == policy, so the timing is exact and HBM holds one tree).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/probe_7b_update.py [C] [layers...]
Defaults: C=512, layers 2 4 6.  Prints one JSON line.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _sync(x):
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    return float(np.asarray(leaves[0].ravel()[0]))


def build_cfg(num_layers: int):
    from spacer_tpu.models.qwen25_vl.config import QWEN25_VL_7B
    import dataclasses

    text = dataclasses.replace(QWEN25_VL_7B.text, num_layers=num_layers)
    return dataclasses.replace(QWEN25_VL_7B, text=text)


def measure(num_layers: int, C: int, G: int = 8, P_len: int = 2048):
    import jax
    import jax.numpy as jnp

    import optax

    from spacer_tpu.models.qwen25_vl import get_rope_index, init_params
    from spacer_tpu.train.step import make_grpo_train_step

    cfg = build_cfg(num_layers)
    params = jax.jit(lambda k: init_params(k, cfg, jnp.bfloat16))(
        jax.random.key(0))
    _sync(params)
    n_bytes = sum(l.size * l.dtype.itemsize
                  for l in jax.tree_util.tree_leaves(params))
    print(f"# L={num_layers}: params resident {n_bytes/2**30:.2f} GiB",
          flush=True)

    # trivial optimizer for the TIMING probe: the int8-Adam apply's
    # per-leaf f32 dequant->EMA->requant temps are sized by the LARGEST
    # leaf — at 7B the 545M-element embedding needs ~9GB of fused-loop
    # temps, which OOMs single-chip next to params+grads (on the fsdp
    # mesh that leaf is 8-way sharded, so the real 7B apply is fine).
    # The apply share is extrapolated from the measured 1.3B apply
    # (79.2 ms for 2.6 GiB of bf16 params — elementwise, bytes-linear)
    # and reported separately in the JSON.
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.scale(-1e-6))
    opt_state = tx.init(params)

    T, H, W = 16, 224, 420
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
        attention_mask=prompt_mask)
    comp_pos = deltas.reshape(-1, 1) + P_len + np.arange(C)[None, :]
    comp_pos = np.repeat(comp_pos, G, axis=0)
    batch = {
        "prompt_ids": jnp.asarray(prompt_ids.astype(np.int32)),
        "prompt_mask": jnp.asarray(prompt_mask.astype(np.int32)),
        "prompt_position_ids": jnp.asarray(pos.astype(np.int32)),
        "completion_ids": jnp.asarray(
            rng.integers(10, 150000, size=(G, C)).astype(np.int32)),
        "completion_position_ids": jnp.asarray(
            np.broadcast_to(comp_pos[None], (3, G, C)).astype(np.int32)),
        "completion_mask": jnp.ones((G, C), jnp.int32),
        "advantages": jnp.asarray(rng.normal(size=(G,)).astype(np.float32)),
        "pixel_values": jax.device_put(rng.normal(
            size=(n_patches, cfg.vision.patch_dim)).astype(jnp.bfloat16)),
    }
    step = make_grpo_train_step(cfg, tx, beta=0.04, remat="dots_narrow",
                                logp_chunk=256)

    # ref share, timed on the SAME tree (step-0 ref == policy numerically;
    # identical shapes => identical timing)
    rl = step.ref_logps_fn(params, batch, grid_thw=(grid1,),
                           num_generations=G)
    _sync(rl)
    t0 = time.perf_counter()
    for _ in range(3):
        rl = step.ref_logps_fn(params, batch, grid_thw=(grid1,),
                               num_generations=G)
    _sync(rl)
    t_ref = (time.perf_counter() - t0) / 3

    batch["ref_logps"] = rl
    params, opt_state, metrics = step(
        params, ref_params=None, opt_state=opt_state, batch=batch,
        grid_thw=(grid1,), num_generations=G)
    float(metrics["loss"])
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        params, opt_state, metrics = step(
            params, ref_params=None, opt_state=opt_state, batch=batch,
            grid_thw=(grid1,), num_generations=G)
    float(metrics["loss"])
    t_vago = (time.perf_counter() - t0) / iters  # vag + opt apply
    print(f"# L={num_layers}: ref_fwd={t_ref:.3f}s vag+opt={t_vago:.3f}s "
          f"total={t_ref + t_vago:.3f}s", flush=True)
    del params, opt_state, batch, rl
    return t_ref + t_vago


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    layer_counts = ([int(x) for x in sys.argv[2:]]
                    if len(sys.argv) > 2 else [2, 4, 6])
    ts = [measure(L, C) for L in layer_counts]
    A = np.stack([np.ones(len(layer_counts)),
                  np.asarray(layer_counts, float)], axis=1)
    (a, b), *_ = np.linalg.lstsq(A, np.asarray(ts), rcond=None)
    t28 = a + b * 28
    G = 8
    # int8-Adam apply, bytes-linear from the 1.3B measurement (one apply
    # per global step under the accumulated update)
    apply_28l_s = 0.0792 * (15.2 / 2.6)
    out = {
        "metric": "update_7b_extrapolated_s_per_group",
        "value": round(float(t28), 3),
        "unit": "s per 8-completion group (P=2048, C=%d)" % C,
        "vs_baseline": 0.0,
        "measured_layers": layer_counts,
        "measured_s": [round(float(t), 3) for t in ts],
        "a_fixed_s": round(float(a), 4),
        "b_per_layer_s": round(float(b), 4),
        "implied_update_sps_28L": round(G / float(t28), 3),
        "apply_extrapolated_s_28L": round(apply_28l_s, 3),
        "apply_basis": "1.3B int8 apply 79.2ms, bytes-linear; one "
                       "apply per global step (accumulated update)",
        "note": ("true 7B layer geometry (3584/18944/152k head) at reduced "
                 "layer counts + linear fit; FULL 28L single-chip update is "
                 "arithmetically infeasible (bf16 params 15.2GiB + grads "
                 "15.2GiB > 15.75GiB HBM) — the deployed path is fsdp "
                 "(dryrun_multichip / test_7b_dress_rehearsal)"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
