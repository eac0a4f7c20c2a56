"""Qwen2.5 language model (M-RoPE, GQA) as a functional JAX program.

Behavioral reference: transformers modeling_qwen2_5_vl.py:491-927 (rotary at
:491, attention at :590, decoder layer at :684, text model at :769).  Layer
parameters are stacked on a leading layer axis and iterated with lax.scan —
one compiled layer body instead of 28 unrolled ones — with optional
jax.checkpoint rematerialization for memory.

KV cache layout: {"k": (L, B, T, Hkv, Dh), "v": ...} preallocated at T =
max length; decode writes at `cache_index` via dynamic_update_slice.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl.config import TextConfig
from spacer_tpu.nn.attention import dot_product_attention
from spacer_tpu.nn.core import dense, dense_init, embed, embed_init, rms_norm, rms_norm_init
from spacer_tpu.nn.rope import apply_rope, mrope_cos_sin, rope_inv_freq

Params = Any


def init_lm_params(key, cfg: TextConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 8)
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    L = cfg.num_layers

    def stack_init(fn, key, *shape_args, **kw):
        ks = jax.random.split(key, L)
        return jax.tree.map(lambda *xs: jnp.stack(xs), *[fn(k, *shape_args, **kw) for k in ks])

    params = {
        "embed_tokens": embed_init(keys[0], cfg.vocab_size, D, dtype),
        "layers": {
            "input_layernorm": {"scale": jnp.ones((L, D), dtype)},
            "post_attention_layernorm": {"scale": jnp.ones((L, D), dtype)},
            "self_attn": {
                "q_proj": stack_init(dense_init, keys[1], D, H * Dh, True, dtype),
                "k_proj": stack_init(dense_init, keys[2], D, Hkv * Dh, True, dtype),
                "v_proj": stack_init(dense_init, keys[3], D, Hkv * Dh, True, dtype),
                "o_proj": stack_init(dense_init, keys[4], H * Dh, D, False, dtype),
            },
            "mlp": {
                "gate_proj": stack_init(dense_init, keys[5], D, I, False, dtype),
                "up_proj": stack_init(dense_init, keys[6], D, I, False, dtype),
                "down_proj": stack_init(dense_init, keys[7], I, D, False, dtype),
            },
        },
        "norm": rms_norm_init(D, dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense_init(
            jax.random.fold_in(key, 99), D, cfg.vocab_size, False, dtype
        )
    return params


def init_kv_cache(cfg: TextConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _layer(
    h, layer_params, cache_kv, *, cfg: TextConfig, cos, sin, kv_mask,
    causal, cache_index, attn_impl,
):
    """One decoder layer. h: (B, S, D). cache_kv: (k, v) slices or None."""
    B, S, D = h.shape
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    p_attn = layer_params["self_attn"]

    x = rms_norm(layer_params["input_layernorm"], h, cfg.rms_norm_eps)
    q = dense(p_attn["q_proj"], x).reshape(B, S, H, Dh)
    k = dense(p_attn["k_proj"], x).reshape(B, S, Hkv, Dh)
    v = dense(p_attn["v_proj"], x).reshape(B, S, Hkv, Dh)
    q, k = apply_rope(q, k, cos, sin)

    q_offset = 0
    new_cache = None
    if cache_kv is not None:
        ck, cv = cache_kv
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_index, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_index, 0, 0))
        k, v = ck.astype(q.dtype), cv.astype(q.dtype)
        q_offset = cache_index
        new_cache = (ck, cv)

    attn = dot_product_attention(
        q, k, v, causal=causal, kv_mask=kv_mask, q_offset=q_offset,
        impl=attn_impl,
    )
    h = h + dense(p_attn["o_proj"], attn.reshape(B, S, H * Dh))

    x = rms_norm(layer_params["post_attention_layernorm"], h, cfg.rms_norm_eps)
    p_mlp = layer_params["mlp"]
    gate = jax.nn.silu(dense(p_mlp["gate_proj"], x))
    up = dense(p_mlp["up_proj"], x)
    h = h + dense(p_mlp["down_proj"], gate * up)
    return h, new_cache


def lm_forward(
    params: Params,
    cfg: TextConfig,
    *,
    input_ids: Optional[jnp.ndarray] = None,      # (B, S)
    input_embeds: Optional[jnp.ndarray] = None,   # (B, S, D)
    position_ids: Optional[jnp.ndarray] = None,   # (3, B, S)
    kv_mask: Optional[jnp.ndarray] = None,        # (B, S) or (B, T) with cache
    causal: bool = True,
    cache=None,
    cache_index: int | jnp.ndarray = 0,
    logits: bool = True,
    remat: bool = False,
    attn_impl: Optional[str] = None,
):
    """Run the LM. Returns (logits_or_hidden, new_cache).

    With `cache`, keys/values of the current block are written at
    `cache_index` and attention runs over the whole cache (masked by
    `kv_mask`, which must then cover the cache length).
    """
    if input_embeds is None:
        input_embeds = embed(params["embed_tokens"], input_ids)
    B, S, D = input_embeds.shape
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(S)[None, None, :], (3, B, S))
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta)
    cos, sin = mrope_cos_sin(position_ids, inv_freq, cfg.mrope_section)

    h = input_embeds

    body_fn = functools.partial(
        _layer, cfg=cfg, cos=cos, sin=sin, kv_mask=kv_mask, causal=causal,
        cache_index=cache_index, attn_impl=attn_impl,
    )

    if cache is None:
        def scan_body(h, layer_params):
            fn = jax.checkpoint(lambda hh, lp: body_fn(hh, lp, None)[0]) if remat else (
                lambda hh, lp: body_fn(hh, lp, None)[0]
            )
            return fn(h, layer_params), None

        h, _ = jax.lax.scan(scan_body, h, params["layers"])
        new_cache = None
    else:
        def scan_body(h, xs):
            layer_params, ck, cv = xs
            h, (ck, cv) = body_fn(h, layer_params, (ck, cv))
            return h, (ck, cv)

        h, (nk, nv) = jax.lax.scan(scan_body, h, (params["layers"], cache["k"], cache["v"]))
        new_cache = {"k": nk, "v": nv}

    h = rms_norm(params["norm"], h, cfg.rms_norm_eps)
    if not logits:
        return h, new_cache
    if cfg.tie_word_embeddings:
        out = jnp.dot(h, params["embed_tokens"]["embedding"].T)
    else:
        out = dense(params["lm_head"], h)
    return out, new_cache
