"""Speculative decoding for the TRAINER's grouped shared-prefix rollout.

Role parity: the reference's rollout engine is vLLM with optional n-gram
prompt-lookup speculation (vllm_grpo_trainer_modified.py:359-384); the
trainer's generation loop (SG_RLVR_trainer.py:462-481) is where those
tokens are produced.  Here the SAME exact speculative machinery that
serves the continuous batcher (serving/speculative.py) is pointed at the
grouped rollout used by SGRLVRTrainer: prompt-lookup drafts (longest
n-gram first), one (1 + k)-token block forward per step, greedy
verification at temperature 0 (bit-exact vs the sequential loop) and
exact speculative sampling otherwise (delta-draft rejection rule — the
emitted-token distribution equals the sequential sampler's at every
position, though the rng stream differs).

Layout differences vs serving/speculative.py (kept numerically in sync
with it and with the sequential grouped loop, language.py _decode_layer):

  - the prompt prefix KV is SHARED across the G completions of a group:
    prefix caches are (B, P, Hkv, Dh) (or the int8 4-tuple) and the
    prefix logits read them once per (group, step) for all G rows —
    exactly like the sequential grouped decode.
  - the per-row tail is position-major (B*G, Cmax, Hkv, Dh); block
    writes land at per-row offsets via the same scatter-free one-hot
    matmul as serving (_write_block), safe by the same
    overwrite-before-read argument (rejected slots are rewritten by the
    next step's block before any mask can expose them).
  - rows retire per-row (per-row t/done) instead of the sequential
    loop's lockstep step counter; the bucketed tail growth is preserved
    (segments exit early when any live row's block could overflow the
    current bucket).

Scope: position-major only — the flash/head-major decode kernel has no
block path (Sampler validates).  int8 weights and int8_kv caches compose
exactly as in serving: per-(position, head) scales ride the same one-hot
block writes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl.config import TextConfig
from spacer_tpu.models.qwen25_vl.language import _mlp_block
from spacer_tpu.nn.core import dense, embed, rms_norm
from spacer_tpu.nn.rope import apply_rope, mrope_cos_sin, rope_inv_freq
from spacer_tpu.serving.speculative import (
    _build_drafts,
    _speculative_sample,
    _write_block,
    _write_block_scales,
)


def _spec_grouped_layer(h, layer_params, prefix_entry, tail_entry, *,
                        cfg: TextConfig, cos, sin, w, prefix_mask,
                        tail_mask, group: int):
    """One decoder layer over a kb-token block per row, GROUPED prefix.

    h: (N, kb, D) with N = B*G rows (group-major).
    prefix_entry: (pk, pv) with pk/pv (B, P, Hkv, Dh) shared across the
    G rows of each group — or the int8 4-tuple (codes + (B, P, Hkv) f32
    scales, ops/quant.py quantize_kv).
    tail_entry: (tk, tv) with tk/tv (N, Cmax, Hkv, Dh) position-major
    per-row tails, or the int8 4-tuple likewise.
    w: (N,) tail write start (= t - 1); prefix_mask (B, P);
    tail_mask (N, kb, Cmax) block-causal: position i reads slot j iff
    j < t + i (its own just-written KV included).

    KEEP NUMERICALLY IN SYNC with serving/speculative.py::_spec_layer
    (per-row prefix) and language.py::_decode_layer (kb=1 grouped) — the
    parity tests pin all three against each other.
    """
    N, kb, D = h.shape
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    gq = H // Hkv
    pk, pv = prefix_entry[0], prefix_entry[1]
    pk_sc, pv_sc = (prefix_entry[2], prefix_entry[3]) \
        if len(prefix_entry) == 4 else (None, None)
    tk, tv = tail_entry[0], tail_entry[1]
    quant_tail = len(tail_entry) == 4
    B = pk.shape[0]
    G = group
    P = pk.shape[1]
    p_attn = layer_params["self_attn"]

    x = rms_norm(layer_params["input_layernorm"], h, cfg.rms_norm_eps)
    q = dense(p_attn["q_proj"], x).reshape(N, kb, H, Dh)
    k = dense(p_attn["k_proj"], x).reshape(N, kb, Hkv, Dh)
    v = dense(p_attn["v_proj"], x).reshape(N, kb, Hkv, Dh)
    q, k = apply_rope(q, k, cos, sin)

    if quant_tail:
        from spacer_tpu.ops.quant import quantize_kv

        tk_sc, tv_sc = tail_entry[2], tail_entry[3]
        kq, ks = quantize_kv(k)               # scales (N, kb, Hkv)
        vq, vs = quantize_kv(v)
        tk = _write_block(tk, kq, w)
        tv = _write_block(tv, vq, w)
        tk_sc = _write_block_scales(tk_sc, ks, w)
        tv_sc = _write_block_scales(tv_sc, vs, w)
        new_tail = (tk, tv, tk_sc, tv_sc)
    else:
        tk = _write_block(tk, k, w)
        tv = _write_block(tv, v, w)
        new_tail = (tk, tv)

    # same numerical contract as the grouped sequential layer: operands in
    # the cache dtype, f32 accumulation, masking/softmax on the f32 logits;
    # int8 K scales fold into the logits, V scales into the probs
    scale = Dh ** -0.5
    cdt = h.dtype
    qb = q.reshape(B, G, kb, Hkv, gq, Dh)
    # prefix logits: one read of (B, P) kv serves all G rows x kb positions
    lp = jnp.einsum("bgkhcd,bphd->bghckp", qb, pk.astype(cdt),
                    preferred_element_type=jnp.float32) * scale
    if pk_sc is not None:
        lp = lp * jnp.transpose(pk_sc, (0, 2, 1))[:, None, :, None, None, :]
    lp = jnp.where(prefix_mask[:, None, None, None, None, :], lp, -1e30)
    # tail logits per completion row
    qt = q.reshape(N, kb, Hkv, gq, Dh)
    lt = jnp.einsum("nkhcd,nthd->nhckt", qt, tk.astype(cdt),
                    preferred_element_type=jnp.float32) * scale
    if quant_tail:
        lt = lt * jnp.transpose(tk_sc, (0, 2, 1))[:, :, None, None, :]
    lt = jnp.where(tail_mask[:, None, None, :, :], lt, -1e30)

    full = jnp.concatenate(
        [lp.reshape(N, Hkv, gq, kb, P), lt], axis=-1
    )  # (N, Hkv, gq, kb, P+Cmax)
    probs = jax.nn.softmax(full, axis=-1)
    probs_p = probs[..., :P].reshape(B, G, Hkv, gq, kb, P)
    probs_t = probs[..., P:]
    if pv_sc is not None:
        probs_p = probs_p * jnp.transpose(
            pv_sc, (0, 2, 1))[:, None, :, None, None, :]
    if quant_tail:
        probs_t = probs_t * jnp.transpose(tv_sc, (0, 2, 1))[:, :, None,
                                                            None, :]
    out = (
        jnp.einsum("bghckp,bphd->bghckd", probs_p.astype(cdt),
                   pv.astype(cdt), preferred_element_type=jnp.float32)
        .reshape(N, Hkv, gq, kb, Dh)
        + jnp.einsum("nhckt,nthd->nhckd", probs_t.astype(cdt),
                     tv.astype(cdt), preferred_element_type=jnp.float32)
    ).astype(h.dtype)
    out = jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(N, kb, H * Dh)
    h = h + dense(p_attn["o_proj"], out)

    x = rms_norm(layer_params["post_attention_layernorm"], h,
                 cfg.rms_norm_eps)
    h = h + _mlp_block(layer_params["mlp"], x, cfg)
    return h, new_tail


def _spec_grouped_step(layers, params_model, cfg: TextConfig, toks, pos3,
                       prefix_split, prefix_mask, tail_split, t,
                       group: int):
    """One speculative block step -> (logits (N, kb, V), new tail_split).

    toks: (N, kb) = [cur, draft_1..draft_{kb-1}]; pos3 (3, N, kb) rope
    positions; t (N,) emitted-token counts (block writes start at t-1).
    """
    N, kb = toks.shape
    Cmax = tail_split[0][0].shape[1]
    h = embed(params_model["embed_tokens"], toks)
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta)
    cos, sin = mrope_cos_sin(pos3, inv_freq, cfg.mrope_section)

    # block-causal tail mask: position i sees slots j < t + i
    iota = jnp.arange(Cmax)
    tail_mask = (iota[None, None, :]
                 < (t[:, None] + jnp.arange(kb))[:, :, None])  # (N, kb, C)
    w = t - 1

    new_tail = []
    for layer_idx in range(cfg.num_layers):
        h, entry = _spec_grouped_layer(
            h, layers[layer_idx], prefix_split[layer_idx],
            tail_split[layer_idx], cfg=cfg, cos=cos, sin=sin, w=w,
            prefix_mask=prefix_mask, tail_mask=tail_mask, group=group,
        )
        new_tail.append(entry)

    h = rms_norm(params_model["norm"], h, cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        logits = jnp.einsum("nkd,vd->nkv", h,
                            params_model["embed_tokens"]["embedding"])
    else:
        logits = dense(params_model["lm_head"], h)
    return logits, tuple(new_tail)


def spec_decode_loop(
    params, text_cfg, layers, prefix_split, prefix_mask, tail_split,
    first_tokens, prompt_ids, prompt_mask, deltas, prompt_len: int,
    group: int, max_new_tokens: int, temperature: float, top_p: float,
    eos_token_id: int, pad_token_id: int, speculate_k: int, rng,
):
    """Speculative shared-prefix rollout loop.

    Drop-in replacement for sampler._decode_loop's while-loops: same
    bucketed tail growth, but each jitted step verifies a block of
    kb = 1 + speculate_k tokens per row and rows advance per-row
    (t: (N,) emitted counts) instead of lockstep.

    prompt_ids/prompt_mask: (B, S) host prompts already left-padded to
    the bucket — the drafting context (each row drafts from its own
    group's prompt + its own emitted tokens).

    Returns (tokens (N, max_new), spec (2,) int32 = [active-row steps,
    emitted tokens] — tokens/steps is the mean per-row acceptance; a
    sequential decode scores exactly 1.0).
    """
    N = first_tokens.shape[0]
    B = prompt_ids.shape[0]
    G = group
    kb = 1 + speculate_k
    sampled = temperature is not None and temperature > 0.0

    # drafting context: every row sees its group's prompt
    pids = jnp.repeat(prompt_ids.astype(jnp.int32), G, axis=0)     # (N, S)
    pmask = jnp.repeat(prompt_mask.astype(bool), G, axis=0)
    deltas = deltas.reshape(-1)

    tokens0 = jnp.zeros((N, max_new_tokens), jnp.int32)
    tokens0 = tokens0.at[:, 0].set(first_tokens.astype(jnp.int32))
    t0 = jnp.ones((N,), jnp.int32)
    done0 = first_tokens == eos_token_id
    cur0 = first_tokens.astype(jnp.int32)
    rows_k = jnp.arange(kb)

    def make_body(bucket: int):
        def body(state):
            caches, cur, t, done, out, spec, rng_c = state
            was_done = done
            drafts = _build_drafts(pids, pmask, out, cur, t, speculate_k,
                                   pad_token_id)
            toks = jnp.concatenate([cur[:, None], drafts], axis=1)
            pos_base = (prompt_len + deltas + t - 1).astype(jnp.int32)
            pos3 = jnp.broadcast_to(
                (pos_base[:, None] + rows_k[None, :])[None], (3, N, kb))
            logits, caches = _spec_grouped_step(
                layers, params["model"], text_cfg, toks, pos3,
                prefix_split, prefix_mask, caches, t, G)

            if sampled:
                from spacer_tpu.sampler.sampler import filtered_logits

                V = logits.shape[-1]
                p = jax.nn.softmax(
                    filtered_logits(logits.reshape(N * kb, V), temperature,
                                    top_p).reshape(N, kb, V), axis=-1)
                rng_c, sub = jax.random.split(rng_c)
                preds, a = _speculative_sample(p, drafts, sub)
            else:
                preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                hit = (preds[:, :-1] == drafts).astype(jnp.int32)
                a = jnp.cumprod(hit, axis=1).sum(axis=1) + 1
            # cap at the first emitted EOS (inclusive) and the budget
            is_eos = preds == eos_token_id
            f = jnp.where(is_eos.any(axis=1),
                          jnp.argmax(is_eos, axis=1), kb)
            a = jnp.minimum(a, f + 1)
            a = jnp.minimum(a, max_new_tokens - t)
            a = jnp.where(was_done, 0, jnp.maximum(a, 0))

            # out[t + i] = preds[i] for i < a (one-hot, no scatter)
            iota = jnp.arange(max_new_tokens)
            sel = ((iota[None, None, :]
                    == (t[:, None] + rows_k[None, :])[:, :, None])
                   & (rows_k[None, :, None] < a[:, None, None]))
            upd = jnp.einsum("nkc,nk->nc", sel.astype(jnp.int32), preds)
            out = jnp.where(sel.any(axis=1), upd, out)

            last = jnp.take_along_axis(
                preds, jnp.maximum(a - 1, 0)[:, None], axis=1)[:, 0]
            cur = jnp.where(was_done, cur, last)
            t = t + a
            done = was_done | (f + 1 <= a) | (t >= max_new_tokens)
            active_rows = (~was_done).sum().astype(jnp.int32)
            spec = spec + jnp.stack(
                [active_rows, a.sum().astype(jnp.int32)])
            return caches, cur, t, done, out, spec, rng_c

        return body

    # bucketed tail growth, like _decode_loop: a segment's while exits as
    # soon as any LIVE row's next block (writes at t-1 .. t-1+kb-1) could
    # overflow the current bucket, then the tails grow one size up.  The
    # final (max_new_tokens) segment drops the overflow guard: writes past
    # the budget are harmless because acceptance is capped at
    # max_new_tokens - t, which always precedes any corrupted position.
    bucket = min(128, max_new_tokens)
    boundaries = []
    while bucket < max_new_tokens:
        boundaries.append(bucket)
        bucket *= 2
    boundaries.append(max_new_tokens)

    def shrink(ts, size):
        return tuple(tuple(e[:, :size] for e in entry) for entry in ts)

    def grow(ts, new_size):
        def pad(e):
            shape = e.shape[:1] + (new_size,) + e.shape[2:]
            return jax.lax.dynamic_update_slice(
                jnp.zeros(shape, e.dtype), e, (0,) * e.ndim)

        return tuple(tuple(pad(e) for e in entry) for entry in ts)

    spec0 = jnp.zeros((2,), jnp.int32)
    state = (shrink(tail_split, boundaries[0]), cur0, t0, done0, tokens0,
             spec0, rng)
    prev = boundaries[0]
    for seg_i, end in enumerate(boundaries):
        if end != prev:
            caches_c, cur_c, t_c, done_c, out_c, spec_c, rng_c = state
            state = (grow(caches_c, end), cur_c, t_c, done_c, out_c,
                     spec_c, rng_c)
            prev = end
        final = seg_i == len(boundaries) - 1

        def cond(state, end=end, final=final):
            _, _, t_c, done_c, _, _, _ = state
            live = ~jnp.all(done_c)
            if final:
                return live
            fits = ~jnp.any(~done_c & (t_c - 1 + kb > end))
            return live & fits

        state = jax.lax.while_loop(cond, make_body(end), state)
    _, _, _, _, tokens, spec, _ = state
    return tokens, spec
