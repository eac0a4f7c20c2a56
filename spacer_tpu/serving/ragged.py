"""Ragged (per-row position) decode step for continuous batching.

The grouped sampler (sampler/sampler.py) decodes B*G rows in LOCKSTEP: one
scalar tail index, every row at the same depth.  Continuous batching breaks
that invariant — each slot holds an independent request admitted at a
different time, so each row writes its KV at its OWN index and masks its
own valid range.  This module provides that decode step over a single
merged per-slot cache of static length T = prompt_len + max_new_tokens:

  cache[r, :prompt_len]   left-padded prompt KV (prefix), masked by the
                          row's prompt mask
  cache[r, prompt_len:]   completion KV, masked by the row's emitted count

The per-row write is a scatter (`.at[arange(R), widx].set`) — one row per
slot per step, so the scattered payload is tiny; XLA keeps the cache
buffer in place inside the serving while_loop (donated state).

This is the TPU counterpart of the reference's vLLM serving role
(vllm_grpo_trainer_modified.py:359-384 batches all ranks' prompts through
one engine); slot refill happens on the host between chunks
(serving/batcher.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl.config import TextConfig
from spacer_tpu.models.qwen25_vl.language import _mlp_block
from spacer_tpu.nn.core import dense, embed, rms_norm
from spacer_tpu.nn.rope import apply_rope, mrope_cos_sin, rope_inv_freq


def _ragged_layer(h, layer_params, ck, cv, *, cfg: TextConfig, cos, sin,
                  widx, kv_mask):
    """One decoder layer over the merged ragged cache.

    h: (R, 1, D); ck/cv: (R, T, Hkv, Dh); widx: (R,) per-row write index;
    kv_mask: (R, T) valid positions INCLUDING the one written this step.
    """
    R, _, D = h.shape
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    p_attn = layer_params["self_attn"]

    x = rms_norm(layer_params["input_layernorm"], h, cfg.rms_norm_eps)
    q = dense(p_attn["q_proj"], x).reshape(R, 1, H, Dh)
    k = dense(p_attn["k_proj"], x).reshape(R, 1, Hkv, Dh)
    v = dense(p_attn["v_proj"], x).reshape(R, 1, Hkv, Dh)
    q, k = apply_rope(q, k, cos, sin)

    rows = jnp.arange(R)
    ck = ck.at[rows, widx].set(k[:, 0].astype(ck.dtype))
    cv = cv.at[rows, widx].set(v[:, 0].astype(cv.dtype))

    # same numerical contract as the grouped decode layer: operands in the
    # cache dtype, f32 accumulation, masking/softmax on the f32 logits
    scale = Dh ** -0.5
    group_q = H // Hkv
    qf = q.reshape(R, Hkv, group_q, Dh)
    logits = jnp.einsum("rhgd,rthd->rhgt", qf, ck.astype(qf.dtype),
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(kv_mask[:, None, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("rhgt,rthd->rhgd", probs.astype(h.dtype),
                     cv.astype(h.dtype),
                     preferred_element_type=jnp.float32).astype(h.dtype)
    h = h + dense(p_attn["o_proj"], out.reshape(R, 1, H * Dh))

    x = rms_norm(layer_params["post_attention_layernorm"], h,
                 cfg.rms_norm_eps)
    h = h + _mlp_block(layer_params["mlp"], x, cfg)
    return h, ck, cv


def ragged_decode_step(
    layers,          # tuple of L per-layer param pytrees (split_layers)
    params,          # non-layer params (embed_tokens, norm, lm_head)
    cfg: TextConfig,
    cur,             # (R,) int32 current input token per slot
    pos3,            # (3, R, 1) rope positions for the current token
    caches,          # tuple of L (ck, cv): (R, T, Hkv, Dh)
    widx,            # (R,) int32 write index for the current token's KV
    kv_mask,         # (R, T) bool valid positions incl. the current one
):
    """One ragged decode step -> (logits (R, V), new caches)."""
    h = embed(params["embed_tokens"], cur[:, None])
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta)
    cos, sin = mrope_cos_sin(pos3, inv_freq, cfg.mrope_section)

    new = []
    for l in range(cfg.num_layers):
        ck, cv = caches[l]
        h, ck, cv = _ragged_layer(
            h, layers[l], ck, cv, cfg=cfg, cos=cos, sin=sin,
            widx=widx, kv_mask=kv_mask,
        )
        new.append((ck, cv))

    h = rms_norm(params["norm"], h, cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        logits = jnp.dot(h[:, 0], params["embed_tokens"]["embedding"].T)
    else:
        logits = dense(params["lm_head"], h[:, 0])
    return logits, tuple(new)
