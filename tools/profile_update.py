"""On-chip decomposition of the GRPO update phase at headline bench shapes.

Times, per ONE group program (the bench runs 8 of these sequentially):
  fwd       loss value only (no grad)      — the fwd share
  vag       value_and_grad (no optimizer)  — fwd+bwd share
  opt       tx.update + apply only         — optimizer-apply share
  step      the full shipped step          — dispatch/total sanity
  attn      flash-attention fwd and fwd+bwd microbench at the program's
            attention shapes, vs stock XLA attention

Usage: python tools/profile_update.py [fwd|vag|opt|step|attn|all]
Each part prints one line; parts are separable so a slow relay can run
them across multiple invocations (compile cache carries over).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _sync(x):
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    # device-to-host fetch forces a real sync on the relay backend
    return float(np.asarray(leaves[0].ravel()[0]))


def build(remat="dots_narrow", beta=0.04):
    import jax
    import jax.numpy as jnp

    from spacer_tpu.models.qwen25_vl import get_rope_index, init_params
    from spacer_tpu.models.qwen25_vl.config import (
        Qwen25VLConfig, TextConfig, VisionConfig,
    )
    from spacer_tpu.train import make_optimizer

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
    _sync(params)

    P_len, C, G = 2048, 1024, 8
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
        cfg, prompt_ids, video_grid_thw=np.array([grid1]),
        attention_mask=prompt_mask)
    comp_pos = deltas.reshape(-1, 1) + P_len + np.arange(C)[None, :]
    comp_pos = np.repeat(comp_pos, G, axis=0)
    pixel_values = jax.device_put(rng.normal(
        size=(n_patches, cfg.vision.patch_dim)).astype(jnp.bfloat16))
    batch = {
        "prompt_ids": jnp.asarray(prompt_ids.astype(np.int32)),
        "prompt_mask": jnp.asarray(prompt_mask.astype(np.int32)),
        "prompt_position_ids": jnp.asarray(pos.astype(np.int32)),
        "completion_ids": jnp.asarray(
            rng.integers(10, 49000, size=(G, C)).astype(np.int32)),
        "completion_position_ids": jnp.asarray(
            np.broadcast_to(comp_pos[None], (3, G, C)).astype(np.int32)),
        "completion_mask": jnp.ones((G, C), jnp.int32),
        "advantages": jnp.asarray(
            rng.normal(size=(G,)).astype(np.float32)),
        "pixel_values": pixel_values,
    }
    import os

    # int8 matches the headline bench's moment storage (bench.py
    # _bench_moment_dtype: f32 moments don't fit single-chip HBM next to
    # policy+ref+activations); SPACER_PROFILE_MOMENTS=float32 for the
    # torch-parity apply cost
    tx = make_optimizer(
        learning_rate=1e-6, total_steps=1000,
        moment_dtype=os.environ.get("SPACER_PROFILE_MOMENTS", "int8"))
    # a LIST: parts that donate params (opt/step) write the updated tree
    # back to built[1] — an extra defensive copy would not fit HBM next to
    # the moments
    return [cfg, params, batch, (grid1,), G, tx, remat, beta]


def timeit(fn, n=3):
    fn()  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    return (time.perf_counter() - t0) / n, out


def part_fwd(built):
    import jax

    cfg, params, batch, grids, G, tx, remat, beta = built
    from spacer_tpu.train.grpo import grpo_loss
    from spacer_tpu.train.step import make_grpo_train_step

    import functools

    import jax.numpy as jnp

    from spacer_tpu.models.registry import family_for_config
    from spacer_tpu.train.step import _completion_logps_shared

    family = family_for_config(cfg)

    @functools.partial(jax.jit, static_argnames=("grids", "n"))
    def fwd_loop(params, batch, grids, n=5):
        def body(i, acc):
            # carry-perturbed params defeat loop hoisting (cost ~10ms of
            # elementwise adds vs the ~400ms body)
            p2 = jax.tree.map(
                lambda p: p + (acc * 1e-30).astype(p.dtype), params)
            return acc + fwd_value(p2, batch, grids).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    def fwd_value(params, batch, grids):
        ve = family.encode_vision(
            params, cfg, {"pixel_values": batch["pixel_values"]}, grids,
            remat=remat, attn_impl=None)
        logps = _completion_logps_shared(
            params, cfg, batch["prompt_ids"], batch["prompt_position_ids"],
            batch["prompt_mask"], batch["completion_ids"],
            batch["completion_position_ids"], batch["completion_mask"],
            G, vision_embeds=ve, remat=remat)
        loss, _ = grpo_loss(logps, None, batch["advantages"],
                            batch["completion_mask"], beta=0.0)
        return loss

    n = 5
    _sync(fwd_loop(params, batch, grids, n))
    t0 = time.perf_counter()
    _sync(fwd_loop(params, batch, grids, n))
    dt = (time.perf_counter() - t0) / n
    print(f"fwd_only_per_group_s: {dt:.4f}  (x8 groups = {8*dt:.3f}s)",
          flush=True)


def part_vag(built):
    import functools

    import jax

    cfg, params, batch, grids, G, tx, remat, beta = built
    from spacer_tpu.models.registry import family_for_config
    from spacer_tpu.train.grpo import grpo_loss
    from spacer_tpu.train.step import _completion_logps_shared

    family = family_for_config(cfg)

    def loss_fn(params, batch):
        ve = family.encode_vision(
            params, cfg, {"pixel_values": batch["pixel_values"]}, grids,
            remat=remat, attn_impl=None)
        logps = _completion_logps_shared(
            params, cfg, batch["prompt_ids"], batch["prompt_position_ids"],
            batch["prompt_mask"], batch["completion_ids"],
            batch["completion_position_ids"], batch["completion_mask"],
            G, vision_embeds=ve, remat=remat)
        loss, _ = grpo_loss(logps, None, batch["advantages"],
                            batch["completion_mask"], beta=0.0)
        return loss

    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def vag_loop(params, batch, n=3):
        def body(i, acc):
            p2 = jax.tree.map(
                lambda p: p + (acc * 1e-30).astype(p.dtype), params)
            loss, grads = jax.value_and_grad(loss_fn)(p2, batch)
            # consume EVERY grad leaf: summing only one leaf lets XLA
            # dead-code-eliminate the other leaves' dW matmuls (~half the
            # backward), which measured 0.463s/group for a vag whose
            # honest cost is ~0.65s (caught 2026-08-20 when grad_chunk
            # "exceeded" its parts)
            gsum = sum(g.sum().astype(jnp.float32)
                       for g in jax.tree_util.tree_leaves(grads))
            return acc + loss.astype(jnp.float32) + gsum * 1e-9

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    n = 3
    _sync(vag_loop(params, batch, n))
    t0 = time.perf_counter()
    _sync(vag_loop(params, batch, n))
    dt = (time.perf_counter() - t0) / n
    print(f"vag_per_group_s: {dt:.4f}  (x8 groups = {8*dt:.3f}s)",
          flush=True)


def part_opt(built):
    import functools

    import jax
    import jax.numpy as jnp

    cfg, params, batch, grids, G, tx, remat, beta = built
    opt_state = tx.init(params)
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-6, params)

    @functools.partial(jax.jit, donate_argnames=("params", "opt_state"))
    def apply(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                              params, updates)
        return params, opt_state

    def run():
        nonlocal params, opt_state
        params, opt_state = apply(params, opt_state, grads)
        return _sync(params)

    dt, _ = timeit(run)
    print(f"opt_apply_s: {dt:.4f}  (x8 applies = {8*dt:.3f}s)", flush=True)
    built[1] = params  # the original tree was donated away; hand back


def part_step(built):
    import jax.numpy as jnp

    cfg, params, batch, grids, G, tx, remat, beta = built
    import jax

    from spacer_tpu.train.step import make_grpo_train_step

    ref_params = jax.tree.map(jnp.copy, params)
    opt_state = tx.init(params)
    step = make_grpo_train_step(cfg, tx, beta=beta, remat=remat)

    def run():
        nonlocal params, opt_state
        params, opt_state, metrics = step(
            params, ref_params, opt_state, batch, grid_thw=grids,
            num_generations=G)
        return float(metrics["loss"])

    dt, _ = timeit(run)
    print(f"full_step_per_group_s: {dt:.4f}  (x8 groups = {8*dt:.3f}s)",
          flush=True)
    built[1] = params  # donated through the step; hand back the live tree


def _loop_time(fn, x0, n=100, warm=1):
    """Time n chained calls inside ONE jit (relay dispatch amortized);
    the carry perturbation keeps each call live (DCE/hoist-safe)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run():
        def body(i, x):
            o = fn(x)
            return x + o.astype(x.dtype) * 1e-6

        return jax.lax.fori_loop(0, n, body, x0)

    for _ in range(warm):
        r = run()
    float(jnp.sum(r))
    t0 = time.perf_counter()
    r = run()
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / n


def part_rtt(built):
    """Pure dispatch+fetch round-trip of a trivial cached program."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    dt, _ = timeit(lambda: _sync(f(x)), n=20)
    print(f"relay_rtt_s: {dt*1e3:.2f}ms per dispatch+fetch", flush=True)


def part_attn(built):
    """Flash fwd / fwd+bwd vs XLA at the completion-attention shape:
    q (8, 1024) rows attending to kv (8, 3072).  fori_loop-amortized."""
    import jax
    import jax.numpy as jnp

    from spacer_tpu.ops.flash_attention import flash_attention

    N, Tq, Tk, Hq, Hkv, Dh = 8, 1024, 3072, 16, 4, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(N, Tq, Hq, Dh)).astype(np.float32),
                    dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(N, Tk, Hkv, Dh)).astype(np.float32),
                    dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(N, Tk, Hkv, Dh)).astype(np.float32),
                    dtype=jnp.bfloat16)

    def xla_attn(q):
        kk = jnp.repeat(k, Hq // Hkv, axis=2)
        vv = jnp.repeat(v, Hq // Hkv, axis=2)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, kk) / np.sqrt(Dh)
        qp = jnp.arange(Tk - Tq, Tk)[:, None]
        kp = jnp.arange(Tk)[None, :]
        s = jnp.where(kp <= qp, s, -1e30)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, vv)

    def fl(q):
        return flash_attention(q, k, v, causal=True, q_offset=Tk - Tq)

    for name, fn in (("flash", fl), ("xla", xla_attn)):
        dt = _loop_time(fn, q, n=100)
        print(f"attn_fwd_{name}: {dt*1e3:.2f}ms  (x12L x8G = "
              f"{dt*96:.3f}s/iter)", flush=True)

        def vag(q, fn=fn):
            return jax.grad(
                lambda q: (fn(q).astype(jnp.float32) ** 2).sum())(q)

        dt = _loop_time(vag, q, n=50)
        print(f"attn_fwdbwd_{name}: {dt*1e3:.2f}ms  (x12L x8G = "
              f"{dt*96:.3f}s/iter)", flush=True)


def part_acc(built):
    """Params-sized bf16 tree add in a fori_loop: the pure device cost of
    one gradient-accumulate (gacc + grads), isolating it from the vag it
    is fused against inside grad_chunk."""
    import jax
    import jax.numpy as jnp

    cfg, params, batch, grids, G, tx, remat, beta = built
    gacc = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.bfloat16), params)
    grads = jax.tree.map(lambda p: jnp.ones_like(p, jnp.bfloat16) * 1e-6,
                         params)

    @jax.jit
    def add_loop(gacc, grads):
        def body(i, a):
            return jax.tree.map(
                lambda x, g: x + (g + i.astype(g.dtype) * 0), a, grads)
        return jax.lax.fori_loop(0, 8, body, gacc)

    def run():
        return _sync(add_loop(gacc, grads))

    dt, _ = timeit(run)
    print(f"acc_add_s (per add): {dt / 8:.4f}  (x8 = {dt:.3f}s)",
          flush=True)


def part_chunk(built):
    """The SHIPPED per-chunk accumulation program (step.grad_chunk: ref fwd
    + vag + accumulate fused) with a donated bf16 accumulator — the unit
    the bench's update phase is 8 of.  Compare against fwd+vag+acc parts:
    any excess is scheduling/memory-pressure cost inside the fused
    program."""
    import jax
    import jax.numpy as jnp

    cfg, params, batch, grids, G, tx, remat, beta = built
    from spacer_tpu.train.step import make_grpo_train_step

    ref_params = jax.tree.map(jnp.copy, params)
    step = make_grpo_train_step(cfg, tx, beta=beta, remat=remat)
    gacc = step.init_gacc(params, jnp.bfloat16)

    def run():
        nonlocal gacc
        gacc, metrics = step.grad_chunk(
            params, ref_params, gacc, batch, grid_thw=grids,
            num_generations=G)
        return float(metrics["loss"])

    dt, _ = timeit(run)
    print(f"grad_chunk_s: {dt:.4f}  (x8 chunks = {8*dt:.3f}s)", flush=True)


def part_chunk_split(built):
    """grad_chunk with the ref forward SPLIT into its own program
    (ref_logps precomputed via step.ref_logps_fn and passed in the batch).
    Compare against `chunk`: if ref_program + split-chunk < fused chunk,
    the fused form pays an XLA scheduling/pressure penalty and the bench
    should dispatch the ref forwards separately (dispatch is ~free)."""
    import jax
    import jax.numpy as jnp

    cfg, params, batch, grids, G, tx, remat, beta = built
    from spacer_tpu.train.step import make_grpo_train_step

    ref_params = jax.tree.map(jnp.copy, params)
    step = make_grpo_train_step(cfg, tx, beta=beta, remat=remat)
    gacc = step.init_gacc(params, jnp.bfloat16)

    def run_ref():
        return step.ref_logps_fn(ref_params, batch, grids, G)

    lps = run_ref()
    _sync(lps)
    t0 = time.perf_counter()
    for _ in range(3):
        _sync(run_ref())
    ref_dt = (time.perf_counter() - t0) / 3

    batch2 = dict(batch, ref_logps=lps)

    def run():
        nonlocal gacc
        gacc, metrics = step.grad_chunk(
            params, ref_params, gacc, batch2, grid_thw=grids,
            num_generations=G)
        return float(metrics["loss"])

    dt, _ = timeit(run)
    print(f"ref_program_s: {ref_dt:.4f}  grad_chunk_preref_s: {dt:.4f}  "
          f"(x8 = {8 * (ref_dt + dt):.3f}s)", flush=True)


PARTS = {"rtt": part_rtt, "fwd": part_fwd, "vag": part_vag,
         "opt": part_opt, "acc": part_acc, "chunk": part_chunk,
         "chunk_split": part_chunk_split, "step": part_step,
         "attn": part_attn}

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    built = build()
    print("# built", flush=True)
    for name, fn in PARTS.items():
        if which in ("all", name):
            fn(built)
