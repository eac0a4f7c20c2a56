"""Rotary position embeddings: 1D RoPE, multimodal 3-axis M-RoPE, and the
2D vision RoPE used by the Qwen2.5-VL ViT.

Numerical contract mirrors modeling_qwen2_5_vl.py (rotate_half at :123,
apply_multimodal_rotary_pos_emb at :545, Qwen2_5_VLRotaryEmbedding at :491,
apply_rotary_pos_emb_vision at :130): frequencies and trig are computed in
float32, applied in the activation dtype.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


def rope_inv_freq(head_dim: int, theta: float) -> jnp.ndarray:
    """(head_dim/2,) inverse frequencies."""
    return 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )


def rotate_half(x):
    x1 = x[..., : x.shape[-1] // 2]
    x2 = x[..., x.shape[-1] // 2 :]
    return jnp.concatenate((-x2, x1), axis=-1)


@functools.lru_cache(maxsize=16)
def rotate_half_matrix(d: int, dp: int | None = None):
    """Constant R with x @ R == rotate_half(x) for head dim d, optionally
    embedded in dp >= d lanes (pad lanes map to 0).

    Exact: every column has a single signed unit entry, so each output
    element is +-x (adding exact zeros), in any float dtype. On TPU this
    replaces rotate_half's lane-unaligned slice/concat (ruinous at head_dim
    80) with a tiny MXU matmul that needs no relayouts."""
    import numpy as np

    half = d // 2
    dp = dp or d
    R = np.zeros((dp, dp), np.float32)
    for j in range(half):
        R[j + half, j] = -1.0
    for j in range(half, d):
        R[j - half, j] = 1.0
    return R


def compute_rope_cos_sin(position_ids, inv_freq):
    """position_ids (..., S) int -> cos, sin of shape (..., S, head_dim).

    emb = concat(freqs, freqs) along the last axis (HF layout, not interleaved).
    """
    pos = position_ids.astype(jnp.float32)[..., None]  # (..., S, 1)
    freqs = pos * inv_freq  # (..., S, head_dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(q, k, cos, sin):
    """Plain 1D RoPE. q,k: (B, S, H, D); cos,sin: (B, S, D)."""
    cos = cos[:, :, None, :].astype(jnp.float32)
    sin = sin[:, :, None, :].astype(jnp.float32)
    q_out = q.astype(jnp.float32) * cos + rotate_half(q.astype(jnp.float32)) * sin
    k_out = k.astype(jnp.float32) * cos + rotate_half(k.astype(jnp.float32)) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def mrope_cos_sin(position_ids, inv_freq, mrope_section):
    """3-axis M-RoPE cos/sin.

    position_ids: (3, B, S) — temporal/height/width position per token.
    Returns cos, sin of shape (B, S, head_dim) after interleaving the three
    axes' rotary channels per `mrope_section` (applied to both the first and
    second half of the concat(freqs, freqs) layout).
    """
    cos3, sin3 = compute_rope_cos_sin(position_ids, inv_freq)  # (3,B,S,D)
    sections = list(mrope_section) * 2
    starts = [0]
    for s in sections:
        starts.append(starts[-1] + s)

    def mix(x):
        parts = []
        for i, s in enumerate(sections):
            sl = x[i % 3, ..., starts[i] : starts[i + 1]]
            parts.append(sl)
        return jnp.concatenate(parts, axis=-1)

    return mix(cos3), mix(sin3)


def apply_mrope(q, k, position_ids, inv_freq, mrope_section):
    """q: (B, S, Hq, D), k: (B, S, Hkv, D), position_ids: (3, B, S)."""
    cos, sin = mrope_cos_sin(position_ids, inv_freq, mrope_section)
    return apply_rope(q, k, cos, sin)


def vision_rope_cos_sin(pos_hw, head_dim: int, theta: float = 10000.0):
    """2D rotary embedding for the ViT.

    pos_hw: (S, 2) int32 (h_pos, w_pos) per patch token.
    Returns cos, sin of shape (S, head_dim): freqs for h and w each use
    head_dim//4 channels, concatenated then duplicated (HF rot_pos_emb:
    rotary dim = head_dim // 2, split across the two axes, then
    emb = concat(rot, rot)).
    """
    inv = rope_inv_freq(head_dim // 2, theta)  # (head_dim/4,)
    h = pos_hw[:, 0].astype(jnp.float32)[:, None] * inv  # (S, head_dim/4)
    w = pos_hw[:, 1].astype(jnp.float32)[:, None] * inv
    rot = jnp.concatenate([h, w], axis=-1)  # (S, head_dim/2)
    emb = jnp.concatenate([rot, rot], axis=-1)  # (S, head_dim)
    return jnp.cos(emb), jnp.sin(emb)


def apply_vision_rope(q, k, cos, sin):
    """q,k: (S, H, D); cos,sin: (S, D). float32 internally (HF parity).

    The rotation uses the exact rotate_half_matrix matmul form (identical
    values; no lane-unaligned slicing at the ViT's head_dim 80)."""
    Rm = jnp.asarray(rotate_half_matrix(q.shape[-1]))
    cos = cos[:, None, :].astype(jnp.float32)
    sin = sin[:, None, :].astype(jnp.float32)
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * cos + (qf @ Rm) * sin
    k_out = kf * cos + (kf @ Rm) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)
