"""Compacting grouped decode: lockstep rollout with live-row compaction.

The grouped rollout (sampler.py _decode_loop) decodes every row until the
batch's LONGEST completion finishes.  bench.py `rollout_waste` measures the
decode cost model t(n) = a + b*n on the chip: at 64 rows the per-row term
(tail-KV reads + qkv/mlp row flops) is ~half the step cost, so rows that
already hit EOS waste ~29% of decode time under realistic completion-length
spreads (the role vLLM's per-sequence scheduling plays for the reference,
vllm_grpo_trainer_modified.py:566-599).

TPU constraint: program shapes are static, so rows cannot retire one at a
time.  Instead decode runs as host-driven CHUNKS over a donated device
state; between chunks the host checks the done mask and, when enough rows
have finished, COMPACTS the batch:

  - width shrink: every group's live rows gather to the front and the
    uniform per-group width halves (G -> G/2 -> ...): dead rows stop
    paying tail-KV/flops while prefix sharing stays intact;
  - group retirement: groups whose rows are ALL done drop out (with their
    prefix cache) when the live-group count halves.

Halving thresholds bound the distinct program shapes to O(log G * log B)
per geometry.  Simulation with the measured a/b puts group+width
compaction at ~22% decode savings of the ~29% row-level ceiling.

All live rows always share one scalar step counter (a row that has emitted
t tokens either died or is at depth t), so the chunk body is EXACTLY the
lockstep body — greedy outputs are bit-identical to the monolithic loop
(pinned by tests/test_sampler_compacting.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spacer_tpu.models.qwen25_vl.language import (
    init_kv_cache,
    lm_decode_step_split,
    lm_forward,
    split_layers,
)
from spacer_tpu.sampler import sampler as _s


def _quantize_params(params, decode_quant):
    layer_params = params["model"]["layers"]
    if decode_quant in ("int8", "int8_kv"):
        from spacer_tpu.ops.quant import quantize_decode_weights

        layer_params, head_q = quantize_decode_weights(
            layer_params, params["model"].get("lm_head"))
        if head_q is not None:
            params = dict(params)
            params["model"] = dict(params["model"])
            params["model"]["lm_head"] = head_q
    return layer_params, params


@functools.partial(
    jax.jit,
    static_argnames=("text_cfg", "num_generations", "temperature", "top_p",
                     "eos_token_id", "attn_impl", "decode_quant",
                     "tail_bucket"),
)
def _prep_jit(params, text_cfg, input_embeds, position_ids, prompt_mask,
              deltas, rng, *, num_generations, temperature, top_p,
              eos_token_id, attn_impl, decode_quant, tail_bucket):
    """Prefill + quantize + initial chunk state, one program.

    Returns (layers, other_params, prefix_split, state).  prefix caches are
    per-GROUP (B rows); tail caches per completion row (B*G, tail_bucket).
    """
    B, S, _ = input_embeds.shape
    G = num_generations
    N = B * G

    prefix_cache = init_kv_cache(text_cfg, B, S, dtype=input_embeds.dtype)
    logits, prefix_cache = lm_forward(
        params["model"], text_cfg, input_embeds=input_embeds,
        position_ids=position_ids, kv_mask=prompt_mask.astype(bool),
        cache=prefix_cache, cache_index=0, attn_impl=attn_impl,
    )
    layer_params, params = _quantize_params(params, decode_quant)
    L = text_cfg.num_layers
    layers = split_layers(layer_params, L)
    prefix_split = split_layers((prefix_cache["k"], prefix_cache["v"]), L)

    tc_shape = (N, tail_bucket, text_cfg.num_kv_heads, text_cfg.head_dim)
    if decode_quant == "int8_kv":
        from spacer_tpu.ops.quant import quantize_kv

        def qp(entry):
            pk, pv = entry
            pkq, pks = quantize_kv(pk)
            pvq, pvs = quantize_kv(pv)
            return (pkq, pvq, pks, pvs)

        prefix_split = tuple(qp(e) for e in prefix_split)
        tail = tuple(
            (jnp.zeros(tc_shape, jnp.int8), jnp.zeros(tc_shape, jnp.int8),
             jnp.zeros(tc_shape[:-1], jnp.float32),
             jnp.zeros(tc_shape[:-1], jnp.float32))
            for _ in range(L)
        )
    else:
        dt = input_embeds.dtype
        tail = tuple(
            (jnp.zeros(tc_shape, dt), jnp.zeros(tc_shape, dt))
            for _ in range(L)
        )

    rng, sub = jax.random.split(rng)
    first = _s.sample_logits(
        jnp.repeat(logits[:, -1], G, axis=0), sub, temperature, top_p
    ).astype(jnp.int32)
    state = {
        "tail": tail,
        "cur": first,
        "done": first == eos_token_id,
        "delta": jnp.repeat(deltas.reshape(-1), G, axis=0).astype(jnp.int32),
        "step": jnp.int32(1),
        "rng": rng,
    }
    other = {k: v for k, v in params["model"].items() if k != "layers"}
    return layers, other, prefix_split, state


@functools.partial(
    jax.jit,
    static_argnames=("text_cfg", "group", "steps", "prompt_len",
                     "temperature", "top_p", "eos_token_id"),
    donate_argnums=(0,),
)
def _chunk_jit(state, layers, other_params, prefix_split, prefix_mask, *,
               text_cfg, group, steps, prompt_len, temperature, top_p,
               eos_token_id):
    """Up to `steps` lockstep decode steps (early exit when all rows done
    or when the tail bucket fills — the host grows it between chunks).

    The body is the monolithic loop's body verbatim (sampler.py make_body):
    same write index, same masks — greedy outputs are bit-identical.
    Returns (new_state, chunk_tokens (N, steps), n_emitted).
    """
    bucket = state["tail"][0][0].shape[1]
    N = state["cur"].shape[0]
    tail_positions = jnp.arange(bucket)
    delta = state["delta"]

    def body(carry):
        i, tokens, cur, done, tail, step, rng = carry
        was_done = done
        pos = (prompt_len + delta + step - 1).astype(jnp.int32)
        pos3 = jnp.broadcast_to(pos[None, :, None], (3, N, 1))
        tail_mask = jnp.broadcast_to(
            tail_positions[None, :] < step, (N, bucket))
        logits, tail = lm_decode_step_split(
            layers, other_params, text_cfg, cur[:, None], pos3, prefix_split,
            prefix_mask, tail, tail_mask, step - 1, group,
        )
        rng, sub = jax.random.split(rng)
        nxt = _s.sample_logits(logits[:, -1], sub, temperature, top_p)
        nxt = jnp.where(was_done,
                        jnp.full_like(nxt, eos_token_id), nxt).astype(
                            jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i))
        done = was_done | (nxt == eos_token_id)
        cur = jnp.where(was_done, cur, nxt)
        return i + 1, tokens, cur, done, tail, step + 1, rng

    def cond(carry):
        i, _, _, done, _, step, _ = carry
        # step < bucket keeps the tail write index (step-1) in range and
        # caps the emitted token index at max_new-1 on the last segment
        # (same bound as the monolithic loop's segment cond); the host
        # grows the bucket when the chunk stops at the edge
        return (i < steps) & ~jnp.all(done) & (step < bucket)

    tokens = jnp.zeros((N, steps), jnp.int32)
    init = (jnp.int32(0), tokens, state["cur"], state["done"],
            state["tail"], state["step"], state["rng"])
    i, tokens, cur, done, tail, step, rng = jax.lax.while_loop(
        cond, body, init)
    new_state = dict(state, tail=tail, cur=cur, done=done, step=step,
                     rng=rng)
    return new_state, tokens, i


@functools.partial(jax.jit, donate_argnums=(0,))
def _grow_jit(state, zeros_like_tail):
    """Double the tail bucket: pad each tail buffer into the bigger zeros."""
    def pad(t, z):
        return jax.lax.dynamic_update_slice(z, t, (0,) * t.ndim)

    return dict(state, tail=jax.tree.map(pad, state["tail"],
                                         zeros_like_tail))


@jax.jit
def _compact_rows_jit(state, row_idx, pad_mask):
    """Gather decode state down to `row_idx` rows; pad slots read a live
    row's buffers but are forced done so they never sample or write masks.
    No donation: the shrunken outputs can never alias the inputs."""
    def g(t):
        return jnp.take(t, row_idx, axis=0)

    return dict(
        state,
        tail=jax.tree.map(g, state["tail"]),
        cur=g(state["cur"]),
        done=g(state["done"]) | pad_mask,
        delta=g(state["delta"]),
    )


@jax.jit
def _gather_groups_jit(prefix_split, prefix_mask, gidx):
    def g(t):
        return jnp.take(t, gidx, axis=0)

    return jax.tree.map(g, prefix_split), jnp.take(prefix_mask, gidx, axis=0)


def _pow2_at_most(n: int, cap: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return min(p, cap)


def compacting_decode(
    params, text_cfg, input_embeds, position_ids, prompt_mask, deltas, rng,
    *, num_generations: int, max_new_tokens: int, temperature: float,
    top_p: float, eos_token_id: int, attn_impl=None, decode_quant=None,
    chunk_steps: int = 64, prompt_len: int | None = None,
):
    """Host-chunked grouped decode with group/width compaction.

    Same contract as sampler._generate_jit (returns (N, max_new) tokens in
    the ORIGINAL row order) plus a stats dict.  Greedy outputs are
    bit-identical to the monolithic loop; at temperature > 0 the sampling
    stream diverges after the first compaction (row count changes the
    categorical draw shapes) — scheduling reorders RNG, not distributions.
    """
    B, S, _ = input_embeds.shape
    G = num_generations
    N0 = B * G
    P = prompt_len if prompt_len is not None else S
    bucket = min(128, max_new_tokens)

    layers, other, prefix_split, state = _prep_jit(
        params, text_cfg, input_embeds, position_ids,
        jnp.asarray(prompt_mask), jnp.asarray(deltas), rng,
        num_generations=G, temperature=temperature, top_p=top_p,
        eos_token_id=eos_token_id, attn_impl=attn_impl,
        decode_quant=decode_quant, tail_bucket=bucket,
    )
    prefix_mask_dev = jnp.asarray(prompt_mask).astype(bool)

    # host bookkeeping: slot -> original row, per-row emitted tokens
    out_tokens = np.zeros((N0, max_new_tokens), np.int32)
    out_tokens[:, 0] = np.asarray(state["cur"])
    slot_to_orig = np.arange(N0)
    group_orig = np.arange(B)          # current group -> original group
    w = G                              # current uniform rows per group
    step = 1
    stats = {"compactions": 0, "chunks": 0, "final_rows": N0}

    def harvest(chunk_tokens, emitted):
        """Write a finished chunk's tokens into the per-original buffers."""
        if emitted <= 0:
            return
        tok = np.asarray(chunk_tokens)[:, :emitted]
        live = slot_to_orig >= 0
        out_tokens[slot_to_orig[live], step - emitted : step] = tok[live]

    while step < max_new_tokens and not bool(np.all(np.asarray(
            state["done"]))):
        if step >= bucket and bucket < max_new_tokens:
            # grow the tail bucket (pad into double-sized zeros)
            bucket = min(bucket * 2, max_new_tokens)
            zeros = jax.tree.map(
                lambda t: jnp.zeros(
                    (t.shape[0], bucket) + t.shape[2:], t.dtype),
                state["tail"])
            state = _grow_jit(state, zeros)
        state, chunk_tokens, i = _chunk_jit(
            state, layers, other, prefix_split, prefix_mask_dev,
            text_cfg=text_cfg, group=w, steps=chunk_steps, prompt_len=P,
            temperature=temperature, top_p=top_p, eos_token_id=eos_token_id,
        )
        emitted = int(i)
        step += emitted
        stats["chunks"] += 1
        harvest(chunk_tokens, emitted)

        done = np.asarray(state["done"])
        if bool(done.all()) or step >= max_new_tokens:
            break

        # --- compaction plan.  A group with a few live stragglers may be
        # SPLIT into several narrower groups that duplicate its prefix slot
        # (prefix gather with repeats) — so the total row count can halve
        # even when one group keeps all G rows alive.  Power-of-two widths
        # and row totals bound the distinct program shapes to O(log^2 G)
        # per geometry; compaction triggers only on a >=2x row reduction so
        # each shape pays for its (cached) compile many times over.
        N = state["cur"].shape[0]
        nB = N // w
        live = (~done).reshape(nB, w)
        live_counts = live.sum(1)

        best = None
        for wc in [w >> s_ for s_ in range(w.bit_length())]:
            n_chunks = int(sum(-(-int(c) // wc) for c in live_counts if c))
            # power-of-two CHUNK count (not row count): the row total
            # n_chunks_p2 * wc stays a multiple of wc even when the group
            # width is not itself a power of two (num_generations=6 gives
            # widths 6/3/1), while distinct program shapes remain
            # O(log^2 G) per geometry
            Np = _pow2_at_most(max(n_chunks, 1), max(N // wc, 1)) * wc
            # fewer rows first; among ties prefer the wider layout (fewer
            # prefix slots to read per step)
            if best is None or (Np, -wc) < (best[0], -best[1]):
                best = (Np, wc)
        new_N, new_w = best
        if new_N > N // 2:
            continue

        groups = []   # (current_group_index, live row offsets chunk)
        for g_ in range(nB):
            rows = np.nonzero(live[g_])[0]
            for s_ in range(0, len(rows), new_w):
                groups.append((g_, rows[s_ : s_ + new_w]))
        while len(groups) * new_w < new_N:
            groups.append((0, np.zeros((0,), np.int64)))  # dead pad group

        row_idx = np.zeros((new_N,), np.int32)
        pad_mask = np.zeros((new_N,), bool)
        new_map = np.full((new_N,), -1, np.int64)
        gidx = np.zeros((len(groups),), np.int32)
        for j, (g_, rows) in enumerate(groups):
            gidx[j] = g_
            for k in range(new_w):
                dst = j * new_w + k
                if k < len(rows):
                    src = int(g_ * w + rows[k])
                    row_idx[dst] = src
                    new_map[dst] = slot_to_orig[src]
                else:
                    pad_mask[dst] = True
        state = _compact_rows_jit(
            state, jnp.asarray(row_idx), jnp.asarray(pad_mask))
        prefix_split, prefix_mask_dev = _gather_groups_jit(
            prefix_split, prefix_mask_dev, jnp.asarray(gidx))
        group_orig = group_orig[gidx]
        slot_to_orig = new_map
        w = new_w
        stats["compactions"] += 1
        stats["final_rows"] = new_N

    return out_tokens, stats
