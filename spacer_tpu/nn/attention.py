"""Attention dispatcher: Pallas flash kernel on TPU, XLA reference elsewhere.

The XLA path is the numerics oracle (fp32 logits + softmax); the Pallas path
(spacer_tpu.ops.flash_attention) implements the same contract block-wise with
online softmax. Both support GQA (Hq a multiple of Hkv), causal masking,
padding masks, and segment ids (block-diagonal attention for the ViT's
windowed/varlen layout and for packed sequences).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def xla_attention(
    q, k, v, *, causal=False, q_segment_ids=None, kv_segment_ids=None,
    kv_mask=None, scale=None, q_offset=0,
):
    """Reference attention. q: (B, Sq, Hq, D), k/v: (B, Skv, Hkv, D).

    - `causal`: token i attends to kv positions <= i + q_offset (q_offset
      supports decode where the query block sits at the end of the cache).
    - `q_segment_ids`/`kv_segment_ids`: (B, S) int; attention only within
      equal segment ids (0 may be used for padding together with kv_mask).
    - `kv_mask`: (B, Skv) bool; False positions are masked out.
    """
    b, sq, hq, d = q.shape
    hkv = k.shape[2]
    skv = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    group = hq // hkv

    def build_mask(extra_dims):
        mask = None
        if causal:
            qpos = jnp.arange(sq)[:, None] + q_offset
            kpos = jnp.arange(skv)[None, :]
            mask = jnp.broadcast_to(
                (kpos <= qpos).reshape((1,) * (1 + extra_dims) + (sq, skv)),
                (b,) + (1,) * extra_dims + (sq, skv),
            )
        if kv_mask is not None:
            m2 = kv_mask.reshape((b,) + (1,) * extra_dims + (1, skv))
            mask = m2 if mask is None else (mask & m2)
        if q_segment_ids is not None and kv_segment_ids is not None:
            seg = (q_segment_ids[:, :, None] == kv_segment_ids[:, None, :])
            seg = seg.reshape((b,) + (1,) * extra_dims + (sq, skv))
            mask = seg if mask is None else (mask & seg)
        return mask

    if group == 1:
        # equal heads (the ViT case): plain 4D einsums
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
        ) * scale
        mask = build_mask(1)
        if mask is not None:
            logits = jnp.where(mask, logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
        return out.astype(q.dtype)

    # grouped-query attention without materializing repeated kv (a 4x cache
    # bandwidth saving on the decode path)
    qg = q.reshape(b, sq, hkv, group, d).astype(jnp.float32)
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k.astype(jnp.float32))
    logits = logits * scale
    mask = build_mask(2)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v.astype(jnp.float32))
    return out.reshape(b, sq, hq, d).astype(q.dtype)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def dot_product_attention(
    q, k, v, *, causal=False, q_segment_ids=None, kv_segment_ids=None,
    kv_mask=None, scale=None, q_offset=0, impl=None,
):
    """Dispatch to the fastest available implementation.

    impl: "xla" | "pallas" | None (auto) | ("ring", mesh, axis_name) for
    sequence-parallel ring attention over a mesh axis (self-attention only,
    no cache).  Env SPACER_ATTN_IMPL overrides the string forms.
    """
    if isinstance(impl, tuple) and impl and impl[0] == "ring":
        _, mesh, axis_name = impl
        if (q_segment_ids is None and q.shape[1] == k.shape[1]
                and q_offset == 0):
            from spacer_tpu.ops.ring_attention import make_ring_attention

            ring = make_ring_attention(mesh, axis_name, causal=causal)
            return ring(q, k, v, kv_mask)
        impl = "xla"  # cache/segment shapes: ring does not apply
    impl = impl or os.environ.get("SPACER_ATTN_IMPL") or "auto"
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if impl == "pallas":
        try:
            from spacer_tpu.ops.flash_attention import flash_attention

            return flash_attention(
                q, k, v, causal=causal, q_segment_ids=q_segment_ids,
                kv_segment_ids=kv_segment_ids, kv_mask=kv_mask, scale=scale,
                q_offset=q_offset,
            )
        except (ImportError, NotImplementedError):
            pass
    return xla_attention(
        q, k, v, causal=causal, q_segment_ids=q_segment_ids,
        kv_segment_ids=kv_segment_ids, kv_mask=kv_mask, scale=scale,
        q_offset=q_offset,
    )
