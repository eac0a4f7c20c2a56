"""Decoder language model (M-RoPE, GQA) as a functional JAX program.

Behavioral reference: transformers modeling_qwen2_5_vl.py:491-927 (rotary at
:491, attention at :590, decoder layer at :684, text model at :769).  Layer
parameters are stacked on a leading layer axis and iterated with lax.scan —
one compiled layer body instead of 28 unrolled ones — with optional
jax.checkpoint rematerialization for memory.

KV cache layout: {"k": (L, B, T, Hkv, Dh), "v": ...} preallocated at T =
max length; decode writes at `cache_index` via dynamic_update_slice.

This module is the shared decoder engine for every model family in the
repo: plain 1D RoPE (Aria/Llama-style) is M-RoPE with all three position
rows equal and mrope_section = (head_dim//2, 0, 0), and a Mixture-of-
Experts feed-forward (Aria, modeling_aria.py AriaTextDecoderLayer:568-608)
slots in through `_mlp_block` when cfg.moe_topk > 0.  Keeping one engine
means the shared-prefix grouped decode and the train-step paths serve all
families.
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


def narrow_dots_policy(wide: int):
    """Checkpoint policy: save matmul outputs EXCEPT wide ones (>= `wide`
    lanes, i.e. the MLP gate/up intermediates, ~70% of dots-saveable bytes
    at 4x expansion).  Backward recomputes just those two matmuls — a
    fraction of full remat's whole-layer recompute at a fraction of
    dots_with_no_batch_dims' memory.  Used via remat="dots_narrow"."""

    def policy(prim, *args, **params):
        if prim.name != "dot_general":
            return False
        (_, rhs_c), (lhs_b, rhs_b) = params["dimension_numbers"]
        if lhs_b or rhs_b:
            return False  # batched: attention einsums, recompute
        rhs = args[1]
        out_free = [d for i, d in enumerate(rhs.shape) if i not in rhs_c]
        return max(out_free, default=0) < wide

    return policy


def _remat_wrap(layer_fn, remat, cfg: TextConfig):
    """Apply the configured rematerialization to a layer body.

    remat: False | True (full per-layer recompute) | "dots" (save all
    non-batch matmul outputs) | "dots_narrow" (save all but the wide MLP
    intermediates — fits where "dots" OOMs, recomputes only gate/up)."""
    if remat == "dots":
        return jax.checkpoint(
            layer_fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    if remat == "dots_narrow" or (
            isinstance(remat, str) and remat.startswith("dots_mixed:")):
        # dots_mixed is split into per-layer-range "dots"/"dots_narrow"
        # scans by lm_apply; any other path (e.g. a cached decode) gets
        # the narrow policy as the safe equivalent
        return jax.checkpoint(
            layer_fn, policy=narrow_dots_policy(cfg.intermediate_size)
        )
    if remat:
        return jax.checkpoint(layer_fn)
    return layer_fn


def _mlp_block(p_mlp, x, cfg: TextConfig):
    """Feed-forward dispatch: SwiGLU (Qwen) or MoE (Aria, cfg.moe_topk>0)."""
    if getattr(cfg, "moe_topk", 0):
        from spacer_tpu.ops.moe import moe_mlp

        return moe_mlp(
            p_mlp, x, topk=cfg.moe_topk,
            impl=getattr(cfg, "moe_impl", None),
            capacity_factor=getattr(cfg, "moe_capacity_factor", 2.0),
            ep_axis=getattr(cfg, "moe_ep_axis", "fsdp"),
        )
    gate = jax.nn.silu(dense(p_mlp["gate_proj"], x))
    up = dense(p_mlp["up_proj"], x)
    return dense(p_mlp["down_proj"], gate * up)


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
    h = h + _mlp_block(layer_params["mlp"], x, cfg)
    return h, new_cache


def _decode_layer(h, layer_params, prefix_entry, tail_entry, *,
                  cfg: TextConfig, cos, sin, prefix_mask, tail_mask,
                  tail_index, group: int):
    """One decoder layer for shared-prefix decode.

    h: (B*G, 1, D) current-token hidden states.
    prefix_entry: (pk, pv) with pk/pv (B, P, Hkv, Dh) — the prefix cache,
    shared across the G completions of each prompt (read ONCE per step for
    the whole group) — or (pk_q8, pv_q8, pk_scale, pv_scale) with int8 codes
    and (B, P, Hkv) f32 scales (ops/quant.py quantize_kv).
    tail_entry: (tk, tv) with tk/tv (B*G, NEW, Hkv, Dh) per-completion tail
    cache (current k/v written at tail_index), or the int8 4-tuple likewise.
    """
    N, _, D = h.shape
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
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
    q = dense(p_attn["q_proj"], x).reshape(N, 1, H, Dh)
    k = dense(p_attn["k_proj"], x).reshape(N, 1, Hkv, Dh)
    v = dense(p_attn["v_proj"], x).reshape(N, 1, Hkv, Dh)
    q, k = apply_rope(q, k, cos, sin)

    if quant_tail:
        from spacer_tpu.ops.quant import quantize_kv

        tk_sc, tv_sc = tail_entry[2], tail_entry[3]
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        tk = jax.lax.dynamic_update_slice(tk, kq, (0, tail_index, 0, 0))
        tv = jax.lax.dynamic_update_slice(tv, vq, (0, tail_index, 0, 0))
        tk_sc = jax.lax.dynamic_update_slice(tk_sc, ks, (0, tail_index, 0))
        tv_sc = jax.lax.dynamic_update_slice(tv_sc, vs, (0, tail_index, 0))
        new_tail = (tk, tv, tk_sc, tv_sc)
    else:
        tk = jax.lax.dynamic_update_slice(tk, k.astype(tk.dtype),
                                          (0, tail_index, 0, 0))
        tv = jax.lax.dynamic_update_slice(tv, v.astype(tv.dtype),
                                          (0, tail_index, 0, 0))
        new_tail = (tk, tv)

    # attention math: operands stay in the cache dtype (bf16 on TPU) with
    # f32 ACCUMULATION via preferred_element_type — never .astype the caches
    # (that would materialize an f32 copy of the whole KV every layer every
    # step, tripling decode HBM traffic and forcing 4-pass f32 MXU matmuls);
    # scale/softmax run on the f32 logits, so statistics stay exact.
    # int8 caches: the per-vector dequant scales stay OUT of the matmuls —
    # K scales multiply the f32 logits, V scales fold into the probs — so
    # the int8->bf16 convert of the codes fuses into the operand load.
    scale = Dh ** -0.5
    cdt = h.dtype
    group_q = H // Hkv
    qf = q.reshape(B, G, Hkv, group_q, Dh)
    # prefix logits: one read of (B, P) kv serves all G rows
    lp = jnp.einsum("bghcd,bphd->bghcp", qf, pk.astype(cdt),
                    preferred_element_type=jnp.float32) * scale
    if pk_sc is not None:
        lp = lp * jnp.transpose(pk_sc, (0, 2, 1))[:, None, :, None, :]
    lp = jnp.where(prefix_mask[:, None, None, None, :],
                   lp, -1e30)  # (B, G, Hkv, group, P)
    # tail logits per completion row
    qt = qf.reshape(N, Hkv, group_q, Dh)
    lt = jnp.einsum("nhcd,nthd->nhct", qt, tk.astype(cdt),
                    preferred_element_type=jnp.float32) * scale
    if quant_tail:
        lt = lt * jnp.transpose(tk_sc, (0, 2, 1))[:, :, None, :]
    lt = jnp.where(tail_mask[:, None, None, :], lt, -1e30)

    full = jnp.concatenate(
        [lp.reshape(N, Hkv, group_q, P), lt], axis=-1
    )  # (N, Hkv, group, P+NEW)
    probs = jax.nn.softmax(full, axis=-1)
    probs_p = probs[..., :P].reshape(B, G, Hkv, group_q, P)
    probs_t = probs[..., P:]
    if pv_sc is not None:
        probs_p = probs_p * jnp.transpose(pv_sc, (0, 2, 1))[:, None, :, None, :]
    if quant_tail:
        probs_t = probs_t * jnp.transpose(tv_sc, (0, 2, 1))[:, :, None, :]
    out = (
        jnp.einsum("bghcp,bphd->bghcd", probs_p.astype(cdt), pv.astype(cdt),
                   preferred_element_type=jnp.float32)
        .reshape(N, Hkv, group_q, Dh)
        + jnp.einsum("nhct,nthd->nhcd", probs_t.astype(cdt), tv.astype(cdt),
                     preferred_element_type=jnp.float32)
    ).astype(h.dtype)
    h = h + dense(p_attn["o_proj"], out.reshape(N, 1, H * Dh))

    x = rms_norm(layer_params["post_attention_layernorm"], h, cfg.rms_norm_eps)
    h = h + _mlp_block(layer_params["mlp"], x, cfg)
    return h, new_tail


def _decode_layer_hm(h, layer_params, prefix_entry, tail_entry, *,
                     cfg: TextConfig, cos, sin, bias_p, tail_len,
                     tail_index, group: int, use_kernel: bool):
    """Head-major decode layer: attention through the fused flash-decode
    Pallas kernel (ops/flash_decode.py) or its XLA reference.

    Cache layout here is HEAD-MAJOR — prefix (pk, pv): (B, Hkv, P, Dh),
    tail (tk, tv): (B*G, Hkv, T, Dh), int8 scales (…, P)/(…, T) — so each
    (prompt, kv-head) kernel program reads contiguous HBM slabs (see the
    flash_decode module docstring).  Same math as _decode_layer; the only
    mask input is `bias_p` ((B, 1, P) additive f32, constant across the
    decode) plus the scalar live tail length `tail_len`.
    """
    N, _, D = h.shape
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    pk, pv = prefix_entry[0], prefix_entry[1]
    quant = len(prefix_entry) == 4
    B = pk.shape[0]
    G = group
    group_q = H // Hkv
    p_attn = layer_params["self_attn"]

    x = rms_norm(layer_params["input_layernorm"], h, cfg.rms_norm_eps)
    q = dense(p_attn["q_proj"], x).reshape(N, 1, H, Dh)
    k = dense(p_attn["k_proj"], x).reshape(N, 1, Hkv, Dh)
    v = dense(p_attn["v_proj"], x).reshape(N, 1, Hkv, Dh)
    q, k = apply_rope(q, k, cos, sin)

    k_hm = jnp.transpose(k, (0, 2, 1, 3))      # (N, Hkv, 1, Dh)
    v_hm = jnp.transpose(v, (0, 2, 1, 3))
    tk, tv = tail_entry[0], tail_entry[1]
    if quant:
        from spacer_tpu.ops.quant import quantize_kv

        tks, tvs = tail_entry[2], tail_entry[3]
        kq, ks = quantize_kv(k_hm)             # scales (N, Hkv, 1)
        vq, vs = quantize_kv(v_hm)
        tk = jax.lax.dynamic_update_slice(tk, kq, (0, 0, tail_index, 0))
        tv = jax.lax.dynamic_update_slice(tv, vq, (0, 0, tail_index, 0))
        tks = jax.lax.dynamic_update_slice(tks, ks, (0, 0, tail_index))
        tvs = jax.lax.dynamic_update_slice(tvs, vs, (0, 0, tail_index))
        new_tail = (tk, tv, tks, tvs)
    else:
        tk = jax.lax.dynamic_update_slice(tk, k_hm.astype(tk.dtype),
                                          (0, 0, tail_index, 0))
        tv = jax.lax.dynamic_update_slice(tv, v_hm.astype(tv.dtype),
                                          (0, 0, tail_index, 0))
        new_tail = (tk, tv)

    # q rows per (b, hkv): the group's G completions x group_q heads
    q_hm = jnp.transpose(
        q.reshape(B, G, Hkv, group_q, Dh), (0, 2, 1, 3, 4)
    ).reshape(B, Hkv, G * group_q, Dh)

    from spacer_tpu.ops import flash_decode as fd

    if quant:
        scales = (prefix_entry[2][:, :, None, :],
                  prefix_entry[3][:, :, None, :],
                  new_tail[2][:, :, None, :],
                  new_tail[3][:, :, None, :])
    else:
        scales = (None, None, None, None)
    attn_fn = (fd.flash_decode_attention if use_kernel
               else fd.decode_attention_reference)
    out = attn_fn(
        q_hm, pk, pv, bias_p, new_tail[0], new_tail[1], tail_len, *scales,
        group=G, group_q=group_q, sm_scale=Dh ** -0.5,
    )
    out = jnp.transpose(
        out.reshape(B, Hkv, G, group_q, Dh), (0, 2, 1, 3, 4)
    ).reshape(N, 1, H * Dh).astype(h.dtype)
    h = h + dense(p_attn["o_proj"], out)

    x = rms_norm(layer_params["post_attention_layernorm"], h, cfg.rms_norm_eps)
    h = h + _mlp_block(layer_params["mlp"], x, cfg)
    return h, new_tail


def split_layers(stacked, num_layers: int):
    """Stacked (L, ...) pytree -> tuple of L per-layer pytrees.

    Decode is HBM-bound; lax.scan over stacked buffers materializes a sliced
    copy of every layer's weights/caches each step AND rebuilds the stacked
    tail-cache ys, roughly doubling per-step HBM traffic. Per-layer buffers
    let every dot read its operand directly. The split costs one pass over
    the buffers, amortized over the whole decode loop.
    """
    return tuple(
        jax.tree.map(lambda x: x[l], stacked) for l in range(num_layers)
    )


def lm_decode_step(
    params: Params,
    cfg: TextConfig,
    input_ids,            # (B*G, 1)
    position_ids,         # (3, B*G, 1)
    prefix_cache,         # {"k","v": (L, B, P, Hkv, Dh)}
    prefix_mask,          # (B, P)
    tail_cache,           # {"k","v": (L, B*G, NEW, Hkv, Dh)}
    tail_mask,            # (B*G, NEW) — valid tail positions incl. current
    tail_index,           # scalar write position in the tail
    group: int,
):
    """Shared-prefix decode step -> (logits (B*G, 1, V), new tail_cache).

    Stacked-buffer convenience wrapper around lm_decode_step_split (one-shot
    callers); the sampler's decode loop splits once and calls the _split
    variant directly.
    """
    L = cfg.num_layers
    layers = split_layers(params["layers"], L)
    pre = split_layers((prefix_cache["k"], prefix_cache["v"]), L)
    tail = split_layers((tail_cache["k"], tail_cache["v"]), L)
    logits, new_tail = lm_decode_step_split(
        layers, params, cfg, input_ids, position_ids, pre, prefix_mask,
        tail, tail_mask, tail_index, group,
    )
    return logits, {
        "k": jnp.stack([t[0] for t in new_tail]),
        "v": jnp.stack([t[1] for t in new_tail]),
    }


def lm_decode_step_split(
    layers,               # tuple of L per-layer param pytrees
    params: Params,       # non-layer params (embed_tokens, norm, lm_head)
    cfg: TextConfig,
    input_ids,            # (B*G, 1)
    position_ids,         # (3, B*G, 1)
    prefix_split,         # tuple of L (pk, pv): (B, P, Hkv, Dh)
                          #   (or (pk_q8, pv_q8, k_scale, v_scale) int8)
    prefix_mask,          # (B, P)
    tail_split,           # tuple of L (tk, tv): (B*G, NEW, Hkv, Dh)
                          #   (or the int8 4-tuple likewise)
    tail_mask,            # (B*G, NEW); ignored when head_major (tail_len)
    tail_index,
    group: int,
    head_major: bool = False,
    tail_len=None,        # scalar live tail length (head_major only)
    use_kernel: bool = False,
):
    """Per-layer-buffer decode step -> (logits, new tail_split).

    head_major=True switches to the flash-decode cache layout/kernel path
    (_decode_layer_hm): prefix entries (B, Hkv, P, Dh), tails
    (B*G, Hkv, T, Dh), with `tail_len` replacing `tail_mask`.
    """
    h = embed(params["embed_tokens"], input_ids)
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta)
    cos, sin = mrope_cos_sin(position_ids, inv_freq, cfg.mrope_section)

    if head_major:
        from spacer_tpu.ops.flash_decode import MASK_VALUE

        bias_p = jnp.where(prefix_mask, 0.0, MASK_VALUE)[
            :, None, :].astype(jnp.float32)

    new_tail = []
    for l in range(cfg.num_layers):
        if head_major:
            h, entry = _decode_layer_hm(
                h, layers[l], prefix_split[l], tail_split[l], cfg=cfg,
                cos=cos, sin=sin, bias_p=bias_p, tail_len=tail_len,
                tail_index=tail_index, group=group, use_kernel=use_kernel,
            )
        else:
            h, entry = _decode_layer(
                h, layers[l], prefix_split[l], tail_split[l], cfg=cfg,
                cos=cos, sin=sin, prefix_mask=prefix_mask,
                tail_mask=tail_mask, tail_index=tail_index, group=group,
            )
        new_tail.append(entry)

    h = rms_norm(params["norm"], h, cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        logits = jnp.dot(h, params["embed_tokens"]["embedding"].T)
    else:
        logits = dense(params["lm_head"], h)
    return logits, tuple(new_tail)


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
        def scan_body_for(mode):
            def scan_body(h, layer_params):
                layer = lambda hh, lp: body_fn(hh, lp, None)[0]  # noqa: E731
                fn = _remat_wrap(layer, mode, cfg)
                return fn(h, layer_params), None

            return scan_body

        if isinstance(remat, str) and remat.startswith("dots_mixed:"):
            # "dots_mixed:K": the first K layers save their wide MLP
            # intermediates too ("dots" policy — no gate/up recompute in
            # backward), the rest run "dots_narrow".  K trades the HBM
            # headroom that remains under dots_narrow (~336MB/layer at
            # headline train shapes) back into ~0.7 TFLOP/layer of saved
            # recompute; all-K is remat="dots", which OOMs single-chip.
            k = int(remat.split(":", 1)[1])
            wide = jax.tree.map(lambda x: x[:k], params["layers"])
            rest = jax.tree.map(lambda x: x[k:], params["layers"])
            h, _ = jax.lax.scan(scan_body_for("dots"), h, wide)
            h, _ = jax.lax.scan(scan_body_for("dots_narrow"), h, rest)
        else:
            h, _ = jax.lax.scan(scan_body_for(remat), h, params["layers"])
        new_cache = None
    else:
        def scan_body(h, xs):
            layer_params, ck, cv = xs
            layer = lambda hh, lp, c: body_fn(hh, lp, c)  # noqa: E731
            layer = _remat_wrap(layer, remat, cfg)
            h, (ck, cv) = layer(h, layer_params, (ck, cv))
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
