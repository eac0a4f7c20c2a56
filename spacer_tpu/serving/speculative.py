"""Speculative decoding (prompt-lookup drafts) for the continuous
batcher: bit-exact greedy verification at temperature 0, exact
rejection sampling otherwise.

Role parity and beyond: the reference's serving engine (vLLM 0.7.2,
vllm_grpo_trainer_modified.py:359-384) ships n-gram "prompt lookup"
speculative decoding as an experimental flag; the eval harness decodes up
to 1024 "thinking" tokens per sample at temperature 0.01 (evaluate.py:
106-118) — an effectively greedy, highly self-referential workload
(answers quote the question/options) where lookup drafts are cheap and
verification is exact.

Design (TPU-first, scatter-free):

  Each step processes a BLOCK of kb = 1 + speculate_k tokens per row:
  the row's current token plus speculate_k draft tokens proposed by the
  most recent bigram match in that row's own context (prompt + emitted
  tokens, both already on device).  One forward over the block yields
  greedy predictions for every block position; the accepted prefix is
  the longest run where pred[i] == draft[i], plus the first correction
  as a bonus token — so every step emits between 1 and kb tokens and
  greedy outputs match the sequential loop by construction
  (verification IS the sequential rule).  The match is exact up to fp
  reassociation: the block program reduces attention in positional
  order while the ring reduces in rotated slot order, so an EXACT
  logit tie could in principle resolve differently — parity is pinned
  bit-for-bit by the f32 and int8 CPU tests, where ties do not occur.

  KV writes: block i's KV belongs at tail slot t-1+i (per-row offset).
  Instead of the clock ring (whose lockstep global write index cannot
  express per-row acceptance) or a scatter (slow on TPU), the block is
  written with a one-hot matmul over the tail axis — a predictable
  full-tail rewrite that XLA fuses, costing about one extra tail read
  per layer per step.  Rejected slots hold stale drafts, and that is
  safe by the same overwrite-before-read argument as the clock ring
  (serving/ragged.py): the read mask `slot < t + i` never admits a slot
  past the accepted frontier, and the NEXT step's block starts exactly
  at the first stale slot (w' = t'-1 = t+a-1), overwriting all k-a
  stale entries before any mask can expose them.

  The tail read mask collapses from the ring-window arithmetic to a
  plain per-row prefix `arange(Cmax) < t + i` (block-causal within the
  step), because writes are positionally indexed rather than
  clock-indexed.  Admission (prefill + slot insert) is shared with the
  ring batcher unchanged.

Scope: the position-major cache layout (no flash/head-major — the
batcher validates this at construction).  int8 weights and int8_kv
caches compose: the per-(position, head) scales ride the same one-hot
block writes.  temperature == 0 verifies greedily (bit-exact vs the
sequential loop); temperature > 0 runs exact speculative sampling
(_speculative_sample) targeting the same nucleus-filtered distribution
as the sequential sampler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl.config import TextConfig
from spacer_tpu.models.qwen25_vl.language import _mlp_block, split_layers
from spacer_tpu.nn.core import dense, embed, rms_norm
from spacer_tpu.nn.rope import apply_rope, mrope_cos_sin, rope_inv_freq


def _block_onehot(Cmax: int, kb: int, w):
    iota = jnp.arange(Cmax)
    onehot = (iota[None, None, :]
              == (w[:, None] + jnp.arange(kb))[:, :, None])  # (R, kb, C)
    return onehot, onehot.any(axis=1)


def _write_block(tail, blk, w):
    """Per-row block insert without scatter: tail (R, Cmax, Hkv, Dh),
    blk (R, kb, Hkv, Dh), w (R,) start slot per row.  Slots >= Cmax are
    silently dropped (they can never be accepted: t is capped by the
    budget, which is capped by Cmax).  int8 codes accumulate exactly in
    f32 (one nonzero per output slot, values <= 127)."""
    onehot, covered = _block_onehot(tail.shape[1], blk.shape[1], w)
    acc = jnp.float32 if tail.dtype == jnp.int8 else tail.dtype
    upd = jnp.einsum("rkc,rkhd->rchd", onehot.astype(acc), blk.astype(acc))
    return jnp.where(covered[:, :, None, None], upd.astype(tail.dtype),
                     tail)


def _write_block_scales(sc, blk_sc, w):
    """Scale companion of _write_block: sc (R, Cmax, Hkv),
    blk_sc (R, kb, Hkv)."""
    onehot, covered = _block_onehot(sc.shape[1], blk_sc.shape[1], w)
    upd = jnp.einsum("rkc,rkh->rch", onehot.astype(sc.dtype),
                     blk_sc.astype(sc.dtype))
    return jnp.where(covered[:, :, None], upd, sc)


def _spec_layer(h, layer_params, cache_entry, *, cfg: TextConfig, cos, sin,
                w, prefix_mask, tail_mask):
    """One decoder layer over a kb-token block per row.

    h: (R, kb, D); cache_entry (pk, pv, tk, tv) in the position-major
    layout (pk/pv (R, Pmax, Hkv, Dh), tk/tv (R, Cmax, Hkv, Dh)) — or the
    int8 8-tuple with (R, T, Hkv) f32 scales folded into the logits (K)
    and softmax probs (V) exactly like the ring layer.
    w: (R,) tail write start (= t - 1).  prefix_mask (R, Pmax);
    tail_mask (R, kb, Cmax) block-causal: position i reads slot j iff
    j < t + i (its own just-written KV included, like the ring layer).

    KEEP NUMERICALLY IN SYNC with serving/ragged.py::_ragged_layer (this
    is its kb-token generalization; only the write mechanism differs).
    The test_speculative.py parity tests pin the two paths against each
    other, so a drift fails the suite.
    """
    R, kb, D = h.shape
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    pk, pv, tk, tv = cache_entry[:4]
    quant = len(cache_entry) == 8
    P = pk.shape[1]
    p_attn = layer_params["self_attn"]

    x = rms_norm(layer_params["input_layernorm"], h, cfg.rms_norm_eps)
    q = dense(p_attn["q_proj"], x).reshape(R, kb, H, Dh)
    k = dense(p_attn["k_proj"], x).reshape(R, kb, Hkv, Dh)
    v = dense(p_attn["v_proj"], x).reshape(R, kb, Hkv, Dh)
    q, k = apply_rope(q, k, cos, sin)

    if quant:
        from spacer_tpu.ops.quant import quantize_kv

        pk_sc, pv_sc, tk_sc, tv_sc = cache_entry[4:]
        kq, ks = quantize_kv(k)               # scales (R, kb, Hkv)
        vq, vs = quantize_kv(v)
        tk = _write_block(tk, kq, w)
        tv = _write_block(tv, vq, w)
        tk_sc = _write_block_scales(tk_sc, ks, w)
        tv_sc = _write_block_scales(tv_sc, vs, w)
        new_entry = (pk, pv, tk, tv, pk_sc, pv_sc, tk_sc, tv_sc)
    else:
        tk = _write_block(tk, k, w)
        tv = _write_block(tv, v, w)
        new_entry = (pk, pv, tk, tv)

    # same numerical contract as the ring layer: operands in the cache
    # dtype, f32 accumulation, masking/softmax on the f32 logits
    scale = Dh ** -0.5
    group_q = H // Hkv
    qf = jnp.transpose(q.reshape(R, kb, Hkv, group_q, Dh),
                       (0, 2, 3, 1, 4))  # (R, Hkv, g, kb, Dh)
    lp = jnp.einsum("rhgkd,rphd->rhgkp", qf, pk.astype(h.dtype),
                    preferred_element_type=jnp.float32) * scale
    lt = jnp.einsum("rhgkd,rthd->rhgkt", qf, tk.astype(h.dtype),
                    preferred_element_type=jnp.float32) * scale
    if quant:
        # fold the per-(position, head) K scales into the logits
        lp = lp * jnp.transpose(pk_sc, (0, 2, 1))[:, :, None, None, :]
        lt = lt * jnp.transpose(tk_sc, (0, 2, 1))[:, :, None, None, :]
    lp = jnp.where(prefix_mask[:, None, None, None, :], lp, -1e30)
    lt = jnp.where(tail_mask[:, None, None, :, :], lt, -1e30)
    full = jnp.concatenate([lp, lt], axis=-1)
    probs = jax.nn.softmax(full, axis=-1)
    probs_p, probs_t = probs[..., :P], probs[..., P:]
    if quant:
        probs_p = probs_p * jnp.transpose(pv_sc, (0, 2, 1))[:, :, None,
                                                            None, :]
        probs_t = probs_t * jnp.transpose(tv_sc, (0, 2, 1))[:, :, None,
                                                            None, :]
    out = (
        jnp.einsum("rhgkp,rphd->rhgkd", probs_p.astype(h.dtype),
                   pv.astype(h.dtype), preferred_element_type=jnp.float32)
        + jnp.einsum("rhgkt,rthd->rhgkd", probs_t.astype(h.dtype),
                     tv.astype(h.dtype), preferred_element_type=jnp.float32)
    ).astype(h.dtype)
    out = jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(R, kb, H * Dh)
    h = h + dense(p_attn["o_proj"], out)

    x = rms_norm(layer_params["post_attention_layernorm"], h,
                 cfg.rms_norm_eps)
    h = h + _mlp_block(layer_params["mlp"], x, cfg)
    return h, new_entry


def spec_decode_step(layers, params, cfg: TextConfig, toks, pos3, caches,
                     prefix_mask, t):
    """One speculative block step -> (logits (R, kb, V), new caches).

    toks: (R, kb) = [cur, draft_1..draft_{kb-1}]; pos3 (3, R, kb) rope
    positions; t (R,) emitted-token counts (block writes start at t-1).
    """
    R, kb = toks.shape
    Cmax = caches[0][2].shape[1]
    h = embed(params["embed_tokens"], toks)
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta)
    cos, sin = mrope_cos_sin(pos3, inv_freq, cfg.mrope_section)

    # block-causal tail mask: position i sees slots j < t + i
    iota = jnp.arange(Cmax)
    tail_mask = (iota[None, None, :]
                 < (t[:, None] + jnp.arange(kb))[:, :, None])  # (R, kb, C)
    w = t - 1

    new = []
    for l in range(cfg.num_layers):
        h, entry = _spec_layer(
            h, layers[l], caches[l], cfg=cfg, cos=cos, sin=sin, w=w,
            prefix_mask=prefix_mask, tail_mask=tail_mask,
        )
        new.append(entry)

    h = rms_norm(params["norm"], h, cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        logits = jnp.einsum("rkd,vd->rkv", h,
                            params["embed_tokens"]["embedding"])
    else:
        logits = dense(params["lm_head"], h)
    return logits, tuple(new)


def _build_drafts(pids, pmask, out, cur, t, n_draft: int, pad_token: int):
    """Prompt-lookup drafts: for each row, find the most recent earlier
    occurrence of the trailing n-gram in [prompt tokens, emitted tokens]
    — longest first (trigram, then bigram, the standard prompt-lookup
    rule: longer matches predict continuations more reliably) — and
    propose the n_draft tokens that followed it.  No match (or a match
    running off the known context) drafts pad tokens — the first
    verification mismatch simply caps acceptance at the guaranteed 1
    token, so drafting is never wrong, only more or less useful."""
    R, Pmax = pids.shape
    Cmax = out.shape[1]
    PT = Pmax + Cmax
    ctx = jnp.concatenate([pids, out], axis=1)              # (R, PT)
    valid = jnp.concatenate(
        [pmask.astype(bool),
         jnp.arange(Cmax)[None, :] < t[:, None]], axis=1)   # (R, PT)

    cur_pos = Pmax + t - 1                                  # index of cur

    def tok_at(offset):
        """Token `offset` places before cur (clip-gathered; validity is
        checked separately so left-padding never matches)."""
        idx = jnp.clip(cur_pos - offset, 0, PT - 1)[:, None]
        return (jnp.take_along_axis(ctx, idx, axis=1)[:, 0],
                jnp.take_along_axis(valid, idx, axis=1)[:, 0]
                & (cur_pos - offset >= 0))

    prev1, ok1 = tok_at(1)
    prev2, ok2 = tok_at(2)

    j = jnp.arange(PT)
    earlier = (j[None, 1:] < cur_pos[:, None])              # strictly earlier
    m2 = (
        (ctx[:, 1:] == cur[:, None])
        & (ctx[:, :-1] == prev1[:, None])
        & valid[:, 1:] & valid[:, :-1]
        & ok1[:, None] & earlier
    )                                                        # (R, PT-1) at j=1..
    m3 = m2 & jnp.concatenate(
        [jnp.zeros((R, 1), bool),
         (ctx[:, :-2] == prev2[:, None]) & valid[:, :-2]], axis=1,
    ) & ok2[:, None]
    jj = j[None, 1:]
    best3 = jnp.max(jnp.where(m3, jj, -1), axis=1)          # (R,) or -1
    best2 = jnp.max(jnp.where(m2, jj, -1), axis=1)
    best = jnp.where(best3 >= 0, best3, best2)
    has = best >= 0

    # gather the n_draft tokens after the match; clip + validity-mask
    gidx = best[:, None] + 1 + jnp.arange(n_draft)[None, :]  # (R, n)
    in_ctx = gidx < cur_pos[:, None] + 1                     # known context only
    gathered = jnp.take_along_axis(ctx, jnp.clip(gidx, 0, PT - 1), axis=1)
    drafts = jnp.where(has[:, None] & in_ctx, gathered, pad_token)
    return drafts.astype(jnp.int32)


def _speculative_sample(p, drafts, key):
    """Exact speculative sampling with deterministic (delta) drafts.

    p: (R, kb, V) target probabilities per block position (position i is
    the distribution of the token FOLLOWING block token i); drafts
    (R, kb-1) proposed continuations.  Standard rejection rule with
    q = delta(draft): accept draft d_{i+1} at position i with probability
    p_i(d_{i+1}); on the first rejection emit a sample from the residual
    norm((p_i - q)+) = p_i conditioned on != d; if every draft is
    accepted emit a bonus sample from the last position's p.  For every
    position P(emit y) = p(y) exactly:
      y == d: accept prob p(d);  y != d: (1 - p(d)) * p(y)/(1 - p(d)).

    Returns (emit (R, kb) int32, a_base (R,) in [1, kb]) — emit[i] for
    i < a_base are the step's tokens; entries past a_base are arbitrary.
    """
    R, kb, V = p.shape
    ku, kr = jax.random.split(key)
    p_draft = jnp.take_along_axis(
        p[:, :-1], drafts[:, :, None].astype(jnp.int32), axis=-1)[..., 0]
    u = jax.random.uniform(ku, (R, kb - 1))
    accept = (u < p_draft).astype(jnp.int32)
    m = jnp.cumprod(accept, axis=1).sum(axis=1)              # 0..kb-1
    # residual/bonus samples for EVERY position, select index m after:
    # positions < kb-1 exclude their draft; the last position is plain
    excl = jnp.concatenate(
        [drafts.astype(jnp.int32), jnp.full((R, 1), -1, jnp.int32)], axis=1)
    pv = p * (jnp.arange(V)[None, None, :] != excl[:, :, None])
    y = jax.random.categorical(kr, jnp.log(pv + 1e-30), axis=-1)
    y = y.astype(jnp.int32)                                   # (R, kb)
    corr = jnp.take_along_axis(y, m[:, None], axis=1)[:, 0]
    emit = jnp.concatenate(
        [drafts.astype(jnp.int32), y[:, -1:]], axis=1)        # (R, kb)
    emit = jnp.where(jnp.arange(kb)[None, :] == m[:, None],
                     corr[:, None], emit)
    return emit, m + 1


@functools.partial(
    jax.jit,
    static_argnames=("text_cfg", "chunk_steps", "speculate_k",
                     "eos_token_id", "pad_token_id", "temperature",
                     "top_p"),
    donate_argnums=(0,),
)
def spec_chunk_jit(state, layer_params, other_params, *, text_cfg,
                   chunk_steps: int, speculate_k: int, eos_token_id: int,
                   pad_token_id: int, temperature: float = 0.0,
                   top_p: float = 1.0):
    """Run up to chunk_steps speculative block steps (early exit on
    all-done).  State schema shared with the ring batcher; `clock`/`admit`
    pass through untouched (speculation is positionally indexed).

    temperature == 0: greedy verification (deterministic, bit-matches the
    sequential loop).  temperature > 0: exact speculative sampling — the
    emitted-token distribution equals the sequential sampler's
    (softmax of sampler.filtered_logits) at every position, though the
    rng STREAM differs (acceptance changes consumption), so outputs match
    in distribution, not token-for-token."""
    L = text_cfg.num_layers
    layers = split_layers(layer_params, L)
    R, Pmax = state["pmask"].shape
    Cmax = state["out"].shape[1]
    kb = 1 + speculate_k
    pmask = state["pmask"].astype(bool)
    pids = state["pids"]
    delta = state["delta"]
    maxnew = state["maxnew"]
    rows_k = jnp.arange(kb)
    sampled = temperature is not None and temperature > 0.0

    def body(carry):
        i, caches, cur, t, done, out, spec, rng = carry
        was_done = done
        drafts = _build_drafts(pids, pmask, out, cur, t, speculate_k,
                               pad_token_id)
        toks = jnp.concatenate([cur[:, None], drafts], axis=1)  # (R, kb)
        pos_base = (Pmax + delta + t - 1).astype(jnp.int32)
        pos3 = jnp.broadcast_to(
            (pos_base[:, None] + rows_k[None, :])[None], (3, R, kb))
        logits, caches = spec_decode_step(
            layers, other_params, text_cfg, toks, pos3, caches, pmask, t)

        if sampled:
            from spacer_tpu.sampler.sampler import filtered_logits

            V = logits.shape[-1]
            p = jax.nn.softmax(
                filtered_logits(logits.reshape(R * kb, V), temperature,
                                top_p).reshape(R, kb, V), axis=-1)
            rng, sub = jax.random.split(rng)
            preds, a = _speculative_sample(p, drafts, sub)
        else:
            preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            # accepted = leading run where pred[i] == draft[i], plus the
            # first correction: a in [1, kb] emitted tokens preds[0..a-1]
            hit = (preds[:, :-1] == drafts).astype(jnp.int32)
            a = jnp.cumprod(hit, axis=1).sum(axis=1) + 1      # (R,)
        # cap at the first emitted EOS (inclusive) and the budget
        is_eos = preds == eos_token_id
        f = jnp.where(is_eos.any(axis=1),
                      jnp.argmax(is_eos, axis=1), kb)
        a = jnp.minimum(a, f + 1)
        a = jnp.minimum(a, maxnew - t)
        a = jnp.where(was_done, 0, jnp.maximum(a, 0))

        # out[t + i] = preds[i] for i < a (one-hot, no scatter)
        iota = jnp.arange(Cmax)
        sel = ((iota[None, None, :]
                == (t[:, None] + rows_k[None, :])[:, :, None])
               & (rows_k[None, :, None] < a[:, None, None]))
        upd = jnp.einsum("rkc,rk->rc", sel.astype(jnp.int32), preds)
        out = jnp.where(sel.any(axis=1), upd, out)

        last = jnp.take_along_axis(
            preds, jnp.maximum(a - 1, 0)[:, None], axis=1)[:, 0]
        cur = jnp.where(was_done, cur, last)
        t = t + a
        done = was_done | (f + 1 <= a) | (t >= maxnew)
        # telemetry in ROW-steps: a sequential decode emits exactly one
        # token per active row per step, so tokens/steps is the mean
        # per-row acceptance (1.0 = speculation never helped)
        active_rows = (~was_done).sum().astype(jnp.int32)
        spec = spec + jnp.stack(
            [active_rows, a.sum().astype(jnp.int32)])
        return i + 1, caches, cur, t, done, out, spec, rng

    def cond(carry):
        i, _, _, _, done, _, _, _ = carry
        return (i < chunk_steps) & ~jnp.all(done)

    init = (jnp.int32(0), state["caches"], state["cur"], state["t"],
            state["done"], state["out"], state["spec"], state["rng"])
    _, caches, cur, t, done, out, spec, rng = jax.lax.while_loop(
        cond, body, init)
    return {
        "caches": caches, "pmask": state["pmask"], "pids": state["pids"],
        "delta": state["delta"], "admit": state["admit"], "cur": cur,
        "t": t, "done": done, "maxnew": state["maxnew"], "out": out,
        "clock": state["clock"], "spec": spec, "rng": rng,
    }
