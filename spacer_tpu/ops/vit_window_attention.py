"""Windowed attention Pallas kernel for the Qwen2.5-VL ViT.

The ViT's windowed layers attend inside uniform windows of `wt` tokens
(window_size 112px -> 8x8 patches -> wt = 64 tokens, vision.py padded-window
layout). Generic attention paths are a poor fit: XLA materializes masked
(n_win, H, wt, wt) scores with layout churn at head_dim 80, and the generic
flash kernel would sweep the full S x S block grid. This kernel runs one
(head, window-block) program per grid cell: scores, ragged-validity mask,
softmax and the value matmul all stay in VMEM, with the head dim zero-padded
to the 128-lane tile inside the surrounding transpose (numerically exact:
padded q/k lanes contribute 0 to logits, padded v lanes produce discarded 0
output channels).

Backward: custom VJP recomputes through the XLA reference implementation —
gradients are exactly the semantics the train step always had; the kernel
accelerates the (far more frequent) forward/rollout/eval path.

Replaces flash-attn 2's varlen windowed call in the reference ViT
(SG_RLVR_trainer.py:152 attn_implementation; HF modeling_qwen2_5_vl.py
Qwen2_5_VLVisionFlashAttention2 with cu_seqlens).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

MASK_VALUE = -1e30
LANES = 128


def window_kernel_plan(n_win: int, wt: int,
                       max_rows: int = 1024) -> int | None:
    """Block-row count wb for window_attention_hsd, or None if no Mosaic-
    legal plan exists.  Mosaic requires each block dim to be divisible by
    its tile (8 sublanes / 128 lanes) OR equal to the full array dim — the
    bias block's last dim is wb*wt, so wb*wt must be a 128 multiple unless
    one program covers every window.  CPU interpret mode does not enforce
    this, so callers MUST consult the plan before taking the kernel path
    (a tiny video's layout, e.g. wt=60, crashes only on real TPU
    otherwise)."""
    wb = max(1, (max_rows // 2) // wt)
    while wb >= 1:
        if n_win % wb == 0 and (wb * wt) % 128 == 0:
            return wb
        wb -= 1
    if n_win * wt <= max_rows:   # single program, blocks == array dims
        return n_win
    return None


def chunk_kernel_supported(S: int, wt: int, max_rows: int = 2048) -> bool:
    """chunk_attention_hsd legality: the (1, wt, dp) block needs wt % 8 == 0
    or wt == S, and the (wt, wt) f32 score tile must fit VMEM."""
    return wt <= max_rows and (wt % 8 == 0 or wt == S)


def _kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, *, wt: int, scale: float):
    """One (head, window-block) program. The wb windows of the block are
    computed as ONE (R, R) matmul pair (R = wb*wt) — 8x more score flops
    than per-window batched dots, but a single large MXU op instead of many
    64x64 ones, which is several times faster in practice; the
    block-diagonal window structure and ragged validity are VPU masks."""
    q = q_ref[0]                       # (R, dp)
    k = k_ref[0]
    v = v_ref[0]
    R = q.shape[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                          # (R, R)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    s = jnp.where((rows // wt) == (cols // wt), s, MASK_VALUE)
    s = s + bias_ref[0]                # (1, R): 0 valid col, -1e30 pad col
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def validity_bias(lengths, wt: int) -> np.ndarray:
    """(1, n_win*wt) f32 additive bias: 0 on valid slots, -1e30 on the
    replicated pad slots at the end of short windows."""
    valid = np.arange(wt)[None, :] < np.asarray(lengths)[:, None]
    return np.where(valid.reshape(1, -1), 0.0, MASK_VALUE).astype(np.float32)


def _xla_reference_hsd(q, k, v, bias, wt: int, scale: float):
    """Same semantics in the (H, S_pad, DP) layout via plain XLA ops (the
    backward pass and the parity oracle)."""
    H, S_pad, dp = q.shape
    n_win = S_pad // wt
    qr = q.reshape(H, n_win, wt, dp)
    kr = k.reshape(H, n_win, wt, dp)
    vr = v.reshape(H, n_win, wt, dp)
    s = jnp.einsum("hnid,hnjd->hnij", qr, kr,
                   preferred_element_type=jnp.float32) * scale
    s = s + bias.reshape(1, n_win, 1, wt)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("hnij,hnjd->hnid", p, vr,
                   preferred_element_type=jnp.float32)
    return o.reshape(H, S_pad, dp).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def window_attention_hsd(q, k, v, bias, wt: int, scale: float,
                         interpret: bool = False):
    """Kernel-native layout: q,k,v (H, S_pad, DP) with DP a 128 multiple
    (extra lanes zero — exact: they add 0 to logits and produce discarded 0
    output channels); bias from validity_bias(). Returns (H, S_pad, DP).

    The surrounding matmuls should EMIT/CONSUME this layout directly (qkv
    einsum -> (3,H,S,DP), proj einsum from (H,S,DP)) so no transposes or
    pad copies exist anywhere on the path. Differentiable: the VJP
    recomputes through the XLA reference.
    """
    H, S_pad, dp = q.shape
    n_win = S_pad // wt
    wb = window_kernel_plan(n_win, wt)
    assert wb is not None, (
        f"no Mosaic-legal window plan for n_win={n_win}, wt={wt}; callers "
        f"must check window_kernel_plan() and fall back to the XLA path"
    )
    grid = (H, n_win // wb)
    blk = pl.BlockSpec((1, wb * wt, dp), lambda h, b: (h, b, 0))
    return pl.pallas_call(
        functools.partial(_kernel, wt=wt, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, wb * wt), lambda h, b: (0, b)),
            blk, blk, blk,
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((H, S_pad, dp), q.dtype),
        interpret=interpret,
    )(bias, q, k, v)


def _wa_hsd_fwd(q, k, v, bias, wt, scale, interpret):
    return window_attention_hsd(q, k, v, bias, wt, scale, interpret), (
        q, k, v, bias,
    )


def _wa_hsd_bwd(wt, scale, interpret, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(
        lambda q, k, v, bias: _xla_reference_hsd(q, k, v, bias, wt, scale),
        q, k, v, bias,
    )
    return vjp(g)


window_attention_hsd.defvjp(_wa_hsd_fwd, _wa_hsd_bwd)


def _kernel_nomask(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One fully-valid window (chunk) per program — no masks at all."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def chunk_attention_hsd(q, k, v, wt: int, scale: float,
                        interpret: bool = False):
    """Uniform fully-valid chunks (the ViT's full-attention layers: one
    temporal frame chunk per 'window'). q,k,v: (H, S, DP), S = n_chunks*wt,
    one chunk per program — no validity bias needed."""
    H, S, dp = q.shape
    grid = (H, S // wt)
    blk = pl.BlockSpec((1, wt, dp), lambda h, b: (h, b, 0))
    return pl.pallas_call(
        functools.partial(_kernel_nomask, scale=scale),
        grid=grid,
        in_specs=[blk, blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((H, S, dp), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _ca_hsd_fwd(q, k, v, wt, scale, interpret):
    return chunk_attention_hsd(q, k, v, wt, scale, interpret), (q, k, v)


def _ca_hsd_bwd(wt, scale, interpret, res, g):
    q, k, v = res
    S = q.shape[1]
    zero_bias = jnp.zeros((1, S), jnp.float32)
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_reference_hsd(q, k, v, zero_bias, wt, scale),
        q, k, v,
    )
    return vjp(g)


chunk_attention_hsd.defvjp(_ca_hsd_fwd, _ca_hsd_bwd)


def _window_attention_fwd_impl(q, k, v, lengths, wt: int, scale: float,
                               interpret: bool):
    """q,k,v: (S_pad, H, D) in packed uniform-window order."""
    S_pad, H, D = q.shape
    dp = -(-D // LANES) * LANES

    def prep(x):
        x = x.transpose(1, 0, 2)  # (H, S_pad, D)
        if dp != D:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, dp - D)))
        return x

    bias = jnp.asarray(validity_bias(lengths, wt))
    out = window_attention_hsd(
        prep(q), prep(k), prep(v), bias, wt, scale, interpret,
    )
    return out[:, :, :D].transpose(1, 0, 2)


def _xla_reference(q, k, v, lengths, wt: int, scale: float):
    """Same semantics through plain XLA ops (used for the backward pass and
    as the parity oracle in tests)."""
    S_pad, H, D = q.shape
    n_win = S_pad // wt
    valid = np.arange(wt)[None, :] < np.asarray(lengths)[:, None]

    from spacer_tpu.nn.attention import xla_attention

    return xla_attention(
        q.reshape(n_win, wt, H, D), k.reshape(n_win, wt, H, D),
        v.reshape(n_win, wt, H, D), causal=False,
        kv_mask=jnp.asarray(valid), scale=scale,
    ).reshape(S_pad, H, D)


@functools.lru_cache(maxsize=256)
def make_window_attention(lengths: tuple, wt: int, scale: float,
                          interpret: bool):
    """Returns attn(q, k, v) -> out for a fixed window layout.

    lengths: static tuple of per-window valid token counts (every window in
    the padded layout holds exactly `wt` slots; slots >= length are
    replicated pad tokens that must not receive attention mass).
    """

    @jax.custom_vjp
    def attn(q, k, v):
        return _window_attention_fwd_impl(q, k, v, lengths, wt, scale,
                                          interpret)

    def fwd(q, k, v):
        return attn(q, k, v), (q, k, v)

    def bwd(res, g):
        q, k, v = res
        _, vjp = jax.vjp(
            lambda q, k, v: _xla_reference(q, k, v, lengths, wt, scale),
            q, k, v,
        )
        return vjp(g)

    attn.defvjp(fwd, bwd)
    return attn


def window_attention(q, k, v, lengths, *, wt: int, scale=None,
                     interpret=None):
    """Uniform-window attention. q,k,v: (S_pad, H, D); lengths: per-window
    valid counts (sequence or tuple). Differentiable (XLA-recompute VJP)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    fn = make_window_attention(
        tuple(int(x) for x in lengths), int(wt), float(scale), bool(interpret)
    )
    return fn(q, k, v)
