"""Ragged (per-row progress) decode step for continuous batching.

The grouped sampler (sampler/sampler.py) decodes B*G rows in LOCKSTEP: one
scalar tail index, every row at the same depth.  Continuous batching
breaks that invariant — each slot holds an independent request admitted at
a different time.  A naive per-row write index needs a scatter (24 per
step at 12 layers), which is slow on TPU and costs ~1 ms/step over the
lockstep path at 1.3B scale.

Clock-ring design instead: slots advance in lockstep with a GLOBAL step
clock, so every active row's next KV always lands at the same ring index
`clock % Cmax` — a plain dynamic_update_slice across all rows, exactly the
op the grouped decoder uses.  Per-row raggedness moves entirely into the
MASK: a row admitted at clock a with t emitted tokens owns the ring window
{j : (j - a) mod Cmax < t}, which is contiguous-with-wraparound and never
self-collides because a request lives at most Cmax steps.  Rows that are
done (or empty) write unconditionally, and that is safe by the mask-window
argument: a ring position only enters a row's mask window at exactly the
step whose write lands there, and writes precede reads within a layer, so
a stale write is overwritten before any read can see it (see the
_ragged_layer docstring for the full invariant).

Cache layout per layer:
  pk/pv: (R, Pmax, Hkv, Dh)  prompt prefix, written at admission
  tk/tv: (R, Cmax, Hkv, Dh)  completion ring, written at clock % Cmax

This is the TPU counterpart of the reference's vLLM serving role
(vllm_grpo_trainer_modified.py:359-384); slot admission happens on the
host between chunks (serving/batcher.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl.config import TextConfig
from spacer_tpu.models.qwen25_vl.language import _mlp_block
from spacer_tpu.nn.core import dense, embed, rms_norm
from spacer_tpu.nn.rope import apply_rope, mrope_cos_sin, rope_inv_freq


def _ragged_layer_hm(h, layer_params, cache_entry, *, cfg: TextConfig,
                     cos, sin, ring_idx, bias_p, bias_t, use_kernel):
    """Head-major ring layer: attention through the fused ragged
    flash-decode kernel (ops/flash_decode.py) or its XLA reference.

    cache_entry layouts here: pk/pv (R, Hkv, Pmax, Dh), tk/tv
    (R, Hkv, Cmax, Dh), int8 scales (R, Hkv, T).  bias_p/bias_t are the
    per-step additive f32 masks ((R, 1, T), 0 valid / -1e30 dead),
    computed once per step in ragged_decode_step.
    """
    R, _, D = h.shape
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    pk, pv, tk, tv = cache_entry[:4]
    quant = len(cache_entry) == 8
    p_attn = layer_params["self_attn"]

    x = rms_norm(layer_params["input_layernorm"], h, cfg.rms_norm_eps)
    q = dense(p_attn["q_proj"], x).reshape(R, 1, H, Dh)
    k = dense(p_attn["k_proj"], x).reshape(R, 1, Hkv, Dh)
    v = dense(p_attn["v_proj"], x).reshape(R, 1, Hkv, Dh)
    q, k = apply_rope(q, k, cos, sin)
    k_hm = jnp.transpose(k, (0, 2, 1, 3))     # (R, Hkv, 1, Dh)
    v_hm = jnp.transpose(v, (0, 2, 1, 3))

    if quant:
        from spacer_tpu.ops.quant import quantize_kv

        pk_sc, pv_sc, tk_sc, tv_sc = cache_entry[4:]
        kq, ks = quantize_kv(k_hm)            # scales (R, Hkv, 1)
        vq, vs = quantize_kv(v_hm)
        tk = jax.lax.dynamic_update_slice(tk, kq, (0, 0, ring_idx, 0))
        tv = jax.lax.dynamic_update_slice(tv, vq, (0, 0, ring_idx, 0))
        tk_sc = jax.lax.dynamic_update_slice(tk_sc, ks, (0, 0, ring_idx))
        tv_sc = jax.lax.dynamic_update_slice(tv_sc, vs, (0, 0, ring_idx))
        new_entry = (pk, pv, tk, tv, pk_sc, pv_sc, tk_sc, tv_sc)
        scales = (pk_sc[:, :, None, :], pv_sc[:, :, None, :],
                  tk_sc[:, :, None, :], tv_sc[:, :, None, :])
    else:
        tk = jax.lax.dynamic_update_slice(
            tk, k_hm.astype(tk.dtype), (0, 0, ring_idx, 0))
        tv = jax.lax.dynamic_update_slice(
            tv, v_hm.astype(tv.dtype), (0, 0, ring_idx, 0))
        new_entry = (pk, pv, tk, tv)
        scales = (None, None, None, None)

    from spacer_tpu.ops import flash_decode as fd

    group_q = H // Hkv
    attn_fn = (fd.flash_ragged_decode_attention if use_kernel
               else fd.ragged_decode_attention_reference)
    out = attn_fn(
        q.reshape(R, Hkv, group_q, Dh), pk, pv, bias_p,
        new_entry[2], new_entry[3], bias_t, *scales,
        group_q=group_q, sm_scale=Dh ** -0.5,
    )
    out = out.reshape(R, 1, H * Dh).astype(h.dtype)
    h = h + dense(p_attn["o_proj"], out)

    x = rms_norm(layer_params["post_attention_layernorm"], h,
                 cfg.rms_norm_eps)
    h = h + _mlp_block(layer_params["mlp"], x, cfg)
    return h, new_entry


def _ragged_layer(h, layer_params, cache_entry, *, cfg: TextConfig,
                  cos, sin, ring_idx, prefix_mask, ring_mask):
    """One decoder layer over prefix + clock-ring caches.

    h: (R, 1, D).  cache_entry is (pk, pv, tk, tv) with pk/pv
    (R, Pmax, Hkv, Dh) and tk/tv (R, Cmax, Hkv, Dh) — or the int8 8-tuple
    (pk, pv, tk, tv, pk_sc, pv_sc, tk_sc, tv_sc) with int8 codes and
    (R, T, Hkv) f32 scales (ops/quant.py quantize_kv); the scales fold
    into the logits (K) / softmax probs (V) exactly as in the grouped
    decoder, so dequant never materializes.
    ring_idx: scalar clock % Cmax; prefix_mask: (R, Pmax);
    ring_mask: (R, Cmax) valid ring positions INCLUDING the one written.

    Every row writes unconditionally, even done/empty ones.  That is safe:
    a row's mask window {(j - admit) mod Cmax < t} only ever admits a ring
    position at exactly the step whose write lands there (rel of the write
    index is t-1), and writes precede reads in this layer — so stale or
    garbage entries from a previous occupant of the slot are never read.

    KEEP NUMERICALLY IN SYNC with serving/speculative.py::_spec_layer
    (the kb-token block generalization of this layer); the
    test_speculative.py parity tests pin the two against each other.
    """
    R, _, D = h.shape
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    pk, pv, tk, tv = cache_entry[:4]
    quant = len(cache_entry) == 8
    if quant:
        pk_sc, pv_sc, tk_sc, tv_sc = cache_entry[4:]
    P = pk.shape[1]
    p_attn = layer_params["self_attn"]

    x = rms_norm(layer_params["input_layernorm"], h, cfg.rms_norm_eps)
    q = dense(p_attn["q_proj"], x).reshape(R, 1, H, Dh)
    k = dense(p_attn["k_proj"], x).reshape(R, 1, Hkv, Dh)
    v = dense(p_attn["v_proj"], x).reshape(R, 1, Hkv, Dh)
    q, k = apply_rope(q, k, cos, sin)

    if quant:
        from spacer_tpu.ops.quant import quantize_kv

        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        tk = jax.lax.dynamic_update_slice(tk, kq, (0, ring_idx, 0, 0))
        tv = jax.lax.dynamic_update_slice(tv, vq, (0, ring_idx, 0, 0))
        tk_sc = jax.lax.dynamic_update_slice(tk_sc, ks, (0, ring_idx, 0))
        tv_sc = jax.lax.dynamic_update_slice(tv_sc, vs, (0, ring_idx, 0))
        new_entry = (pk, pv, tk, tv, pk_sc, pv_sc, tk_sc, tv_sc)
    else:
        tk = jax.lax.dynamic_update_slice(
            tk, k.astype(tk.dtype), (0, ring_idx, 0, 0))
        tv = jax.lax.dynamic_update_slice(
            tv, v.astype(tv.dtype), (0, ring_idx, 0, 0))
        new_entry = (pk, pv, tk, tv)

    # same numerical contract as the grouped decode layer: operands in the
    # cache dtype, f32 accumulation, masking/softmax on the f32 logits
    scale = Dh ** -0.5
    group_q = H // Hkv
    qf = q.reshape(R, Hkv, group_q, Dh)
    lp = jnp.einsum("rhgd,rthd->rhgt", qf, pk.astype(h.dtype),
                    preferred_element_type=jnp.float32) * scale
    lt = jnp.einsum("rhgd,rthd->rhgt", qf, tk.astype(h.dtype),
                    preferred_element_type=jnp.float32) * scale
    if quant:
        lp = lp * jnp.transpose(pk_sc, (0, 2, 1))[:, :, None, :]
        lt = lt * jnp.transpose(tk_sc, (0, 2, 1))[:, :, None, :]
    lp = jnp.where(prefix_mask[:, None, None, :], lp, -1e30)
    lt = jnp.where(ring_mask[:, None, None, :], lt, -1e30)
    full = jnp.concatenate([lp, lt], axis=-1)
    probs = jax.nn.softmax(full, axis=-1)
    probs_p, probs_t = probs[..., :P], probs[..., P:]
    if quant:
        probs_p = probs_p * jnp.transpose(pv_sc, (0, 2, 1))[:, :, None, :]
        probs_t = probs_t * jnp.transpose(tv_sc, (0, 2, 1))[:, :, None, :]
    out = (
        jnp.einsum("rhgt,rthd->rhgd", probs_p.astype(h.dtype),
                   pv.astype(h.dtype),
                   preferred_element_type=jnp.float32)
        + jnp.einsum("rhgt,rthd->rhgd", probs_t.astype(h.dtype),
                     tv.astype(h.dtype),
                     preferred_element_type=jnp.float32)
    ).astype(h.dtype)
    h = h + dense(p_attn["o_proj"], out.reshape(R, 1, H * Dh))

    x = rms_norm(layer_params["post_attention_layernorm"], h,
                 cfg.rms_norm_eps)
    h = h + _mlp_block(layer_params["mlp"], x, cfg)
    return h, new_entry


def ragged_decode_step(
    layers,          # tuple of L per-layer param pytrees (split_layers)
    params,          # non-layer params (embed_tokens, norm, lm_head)
    cfg: TextConfig,
    cur,             # (R,) int32 current input token per slot
    pos3,            # (3, R, 1) rope positions for the current token
    caches,          # tuple of L (pk, pv, tk, tv) or int8 8-tuples
    ring_idx,        # scalar int32: clock % Cmax
    prefix_mask,     # (R, Pmax) bool
    ring_mask,       # (R, Cmax) bool valid ring positions incl. current
    head_major: bool = False,
    use_kernel: bool = False,
):
    """One clock-ring decode step -> (logits (R, V), new caches).

    head_major=True reads/writes the flash-decode cache layout
    ((R, Hkv, T, Dh), see _ragged_layer_hm) and dispatches attention to
    the fused Pallas kernel (use_kernel) or its XLA reference."""
    h = embed(params["embed_tokens"], cur[:, None])
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta)
    cos, sin = mrope_cos_sin(pos3, inv_freq, cfg.mrope_section)

    if head_major:
        bias_p = jnp.where(prefix_mask, 0.0, -1e30)[
            :, None, :].astype(jnp.float32)
        bias_t = jnp.where(ring_mask, 0.0, -1e30)[
            :, None, :].astype(jnp.float32)

    new = []
    for l in range(cfg.num_layers):
        if head_major:
            h, entry = _ragged_layer_hm(
                h, layers[l], caches[l], cfg=cfg, cos=cos, sin=sin,
                ring_idx=ring_idx, bias_p=bias_p, bias_t=bias_t,
                use_kernel=use_kernel,
            )
        else:
            h, entry = _ragged_layer(
                h, layers[l], caches[l], cfg=cfg, cos=cos, sin=sin,
                ring_idx=ring_idx, prefix_mask=prefix_mask,
                ring_mask=ring_mask,
            )
        new.append(entry)

    h = rms_norm(params["norm"], h, cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        logits = jnp.dot(h[:, 0], params["embed_tokens"]["embedding"].T)
    else:
        logits = dense(params["lm_head"], h[:, 0])
    return logits, tuple(new)
