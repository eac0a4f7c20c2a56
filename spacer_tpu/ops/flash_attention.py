"""Flash attention for TPU in Pallas: blockwise online-softmax forward plus
custom-VJP backward (dq and dk/dv kernels).

Replaces the reference's flash-attn 2 CUDA dependency
(SG_RLVR_trainer.py:152): at the 16k multimodal context the naive attention
matrix (H x S x S) would not fit in HBM, so training REQUIRES a streaming
kernel.  Supports causal masking with a query offset (KV-cache prefill),
padding masks, segment ids (block-diagonal attention for packed sequences /
the ViT's varlen layout) and GQA (kv heads gathered by block index_map —
no materialized repeat on the forward pass).

TPU layout notes: row-statistics (lse, delta) carry a trailing 8-lane
sublane axis and segment ids an 8-wide broadcast axis, because Mosaic
requires the last two block dims to be (8k, 128k)-aligned or full.

Contract matches spacer_tpu.nn.attention.xla_attention; parity is tested
against it including gradients.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -1e30
LANES = 128
SUBLANES = 8


def _mask_for(block_q, block_k, q_start, k_start, causal,
              q_seg_ref, kv_seg_ref):
    mask = None
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = (cols + k_start) <= (rows + q_start)
    if q_seg_ref is not None:
        qs = q_seg_ref[0][:, 0:1]          # (BQ, 1)
        ks = kv_seg_ref[0][0:1, :]         # (1, BK)
        seg = qs == ks
        mask = seg if mask is None else (mask & seg)
    return mask


def _fwd_kernel(
    q_seg_ref, kv_seg_ref,  # (1, BQ, 8), (1, 8, BK) int32 or None
    q_ref, k_ref, v_ref,    # (1, 1, BQ, D), (1, 1, BK, D)
    o_ref,                  # (1, 1, BQ, D)
    lse_ref,                # (1, 1, BQ, 8)
    acc_ref, m_ref, l_ref,  # scratch: (BQ, D), (BQ, 128), (BQ, 128) f32
    *, scale: float, causal: bool, q_offset: int, block_q: int,
    block_k: int, num_kv_blocks: int,
):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    i = pl.program_id(2)
    q_start = i * block_q + q_offset
    k_start = j * block_k

    run = True
    if causal:
        run = k_start <= q_start + block_q - 1

    @pl.when(run)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BQ, BK)

        mask = _mask_for(block_q, block_k, q_start, k_start, causal,
                         q_seg_ref, kv_seg_ref)
        if mask is not None:
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_ref[:, 0:1]                       # (BQ, 1)
        l_prev = l_ref[:, 0:1]
        m_cur = jnp.max(s, axis=1, keepdims=True)    # (BQ, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == num_kv_blocks - 1)
    def _finish():
        l = l_ref[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        lse = m_ref[:, 0:1] + jnp.log(l_safe)        # (BQ, 1)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:]).astype(
            lse_ref.dtype
        )


def _bwd_dq_kernel(
    q_seg_ref, kv_seg_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_acc_ref,
    *, scale: float, causal: bool, q_offset: int, block_q: int,
    block_k: int, num_kv_blocks: int,
):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        dq_acc_ref[:] = jnp.zeros_like(dq_acc_ref)

    i = pl.program_id(2)
    q_start = i * block_q + q_offset
    k_start = j * block_k
    run = True
    if causal:
        run = k_start <= q_start + block_q - 1

    @pl.when(run)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, 0:1]        # (BQ, 1)
        delta = delta_ref[0, 0][:, 0:1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        p = jnp.exp(s - lse)
        mask = _mask_for(block_q, block_k, q_start, k_start, causal,
                         q_seg_ref, kv_seg_ref)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        dq_acc_ref[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == num_kv_blocks - 1)
    def _finish():
        dq_ref[0, 0] = dq_acc_ref[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_seg_ref, kv_seg_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_acc_ref, dv_acc_ref,
    *, scale: float, causal: bool, q_offset: int, block_q: int,
    block_k: int, num_q_blocks: int,
):
    i = pl.program_id(3)  # q block index (sequential)

    @pl.when(i == 0)
    def _init():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    j = pl.program_id(2)  # kv block index
    q_start = i * block_q + q_offset
    k_start = j * block_k
    run = True
    if causal:
        run = k_start <= q_start + block_q - 1

    @pl.when(run)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, 0:1]
        delta = delta_ref[0, 0][:, 0:1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        p = jnp.exp(s - lse)
        mask = _mask_for(block_q, block_k, q_start, k_start, causal,
                         q_seg_ref, kv_seg_ref)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        dv_acc_ref[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        dk_acc_ref[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == num_q_blocks - 1)
    def _finish():
        dk_ref[0, 0] = dk_acc_ref[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc_ref[:].astype(dv_ref.dtype)


def _segments(q_segment_ids, kv_segment_ids, kv_mask, B, Sq, Skv):
    """Fold kv_mask into segment ids; 0 is reserved for masked-out kv.

    Returns (q_seg (B, Sq, 8), kv_seg (B, 8, Skv)) int32 or (None, None).
    """
    if q_segment_ids is None and kv_segment_ids is None and kv_mask is None:
        return None, None
    if q_segment_ids is None:
        q_seg = jnp.ones((B, Sq), jnp.int32)
        kv_seg = jnp.ones((B, Skv), jnp.int32)
    else:
        q_seg = q_segment_ids.astype(jnp.int32) + 1
        kv_seg = kv_segment_ids.astype(jnp.int32) + 1
    if kv_mask is not None:
        kv_seg = jnp.where(kv_mask, kv_seg, 0)
    q_seg = jnp.broadcast_to(q_seg[:, :, None], (B, Sq, SUBLANES))
    kv_seg = jnp.broadcast_to(kv_seg[:, None, :], (B, SUBLANES, Skv))
    return q_seg, kv_seg


def _pick_block(n: int, preferred: int) -> int:
    for b in (preferred, 512, 256, 128, 64, 32, 16, 8):
        if b <= preferred and n % b == 0:
            return b
    return n


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10)
)
def _flash(q, k, v, q_seg, kv_seg, scale, causal, q_offset,
           block_q, block_k, interpret):
    out, _ = _flash_fwd_impl(
        q, k, v, q_seg, kv_seg, scale, causal, q_offset, block_q, block_k,
        interpret,
    )
    return out


def _seg_specs_fwd(block_q, block_k):
    return [
        pl.BlockSpec((1, block_q, SUBLANES), lambda b, h, i, j: (b, i, 0)),
        pl.BlockSpec((1, SUBLANES, block_k), lambda b, h, i, j: (b, 0, j)),
    ]


def _flash_fwd_impl(q, k, v, q_seg, kv_seg, scale, causal, q_offset,
                    block_q, block_k, interpret):
    B, Hq, Sq, D = q.shape
    _, Hkv, Skv, _ = k.shape
    group = Hq // Hkv
    nq = Sq // block_q
    nk = Skv // block_k
    grid = (B, Hq, nq, nk)

    def qmap(b, h, i, j):
        return (b, h, i, 0)

    def kvmap(b, h, i, j):
        return (b, h // group, j, 0)

    has_seg = q_seg is not None
    seg_specs = _seg_specs_fwd(block_q, block_k) if has_seg else []
    seg_args = [q_seg, kv_seg] if has_seg else []

    body = _fwd_kernel if has_seg else functools.partial(_fwd_kernel, None, None)
    kernel = functools.partial(
        body, scale=scale, causal=causal, q_offset=q_offset,
        block_q=block_q, block_k=block_k, num_kv_blocks=nk,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=seg_specs + [
            pl.BlockSpec((1, 1, block_q, D), qmap),
            pl.BlockSpec((1, 1, block_k, D), kvmap),
            pl.BlockSpec((1, 1, block_k, D), kvmap),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), qmap),
            pl.BlockSpec((1, 1, block_q, SUBLANES),
                         lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((B, Hq, Sq, SUBLANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(*seg_args, q, k, v)
    return out, lse


def _flash_fwd(q, k, v, q_seg, kv_seg, scale, causal, q_offset,
               block_q, block_k, interpret):
    out, lse = _flash_fwd_impl(
        q, k, v, q_seg, kv_seg, scale, causal, q_offset, block_q, block_k,
        interpret,
    )
    return out, (q, k, v, q_seg, kv_seg, out, lse)


def _flash_bwd(scale, causal, q_offset, block_q, block_k, interpret,
               residuals, dout):
    q, k, v, q_seg, kv_seg, out, lse = residuals
    B, Hq, Sq, D = q.shape
    _, Hkv, Skv, _ = k.shape
    group = Hq // Hkv
    nq = Sq // block_q
    nk = Skv // block_k

    delta = jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32),
                    axis=-1)  # (B, Hq, Sq)
    delta = jnp.broadcast_to(delta[..., None], (B, Hq, Sq, SUBLANES))

    def qmap(b, h, i, j):
        return (b, h, i, 0)

    def kvmap(b, h, i, j):
        return (b, h // group, j, 0)

    has_seg = q_seg is not None
    seg_args = [q_seg, kv_seg] if has_seg else []
    seg_specs_q = _seg_specs_fwd(block_q, block_k) if has_seg else []

    body = _bwd_dq_kernel if has_seg else functools.partial(
        _bwd_dq_kernel, None, None
    )
    dq_kernel = functools.partial(
        body, scale=scale, causal=causal, q_offset=q_offset,
        block_q=block_q, block_k=block_k, num_kv_blocks=nk,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(B, Hq, nq, nk),
        in_specs=seg_specs_q + [
            pl.BlockSpec((1, 1, block_q, D), qmap),
            pl.BlockSpec((1, 1, block_k, D), kvmap),
            pl.BlockSpec((1, 1, block_k, D), kvmap),
            pl.BlockSpec((1, 1, block_q, D), qmap),
            pl.BlockSpec((1, 1, block_q, SUBLANES), qmap),
            pl.BlockSpec((1, 1, block_q, SUBLANES), qmap),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), qmap),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(*seg_args, q, k, v, dout, lse, delta)

    # dk/dv per q head, reduced over the GQA group afterwards
    seg_specs_kv = []
    if has_seg:
        seg_specs_kv = [
            pl.BlockSpec((1, block_q, SUBLANES), lambda b, h, j, i: (b, i, 0)),
            pl.BlockSpec((1, SUBLANES, block_k), lambda b, h, j, i: (b, 0, j)),
        ]

    def qmap2(b, h, j, i):
        return (b, h, i, 0)

    def kvmap2(b, h, j, i):
        return (b, h // group, j, 0)

    def kvout(b, h, j, i):
        return (b, h, j, 0)

    body = _bwd_dkv_kernel if has_seg else functools.partial(
        _bwd_dkv_kernel, None, None
    )
    dkv_kernel = functools.partial(
        body, scale=scale, causal=causal, q_offset=q_offset,
        block_q=block_q, block_k=block_k, num_q_blocks=nq,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(B, Hq, nk, nq),
        in_specs=seg_specs_kv + [
            pl.BlockSpec((1, 1, block_q, D), qmap2),
            pl.BlockSpec((1, 1, block_k, D), kvmap2),
            pl.BlockSpec((1, 1, block_k, D), kvmap2),
            pl.BlockSpec((1, 1, block_q, D), qmap2),
            pl.BlockSpec((1, 1, block_q, SUBLANES), qmap2),
            pl.BlockSpec((1, 1, block_q, SUBLANES), qmap2),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, D), kvout),
            pl.BlockSpec((1, 1, block_k, D), kvout),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, Skv, D), k.dtype),
            jax.ShapeDtypeStruct((B, Hq, Skv, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(*seg_args, q, k, v, dout, lse, delta)

    if group > 1:
        dk = dk.reshape(B, Hkv, group, Skv, D).sum(axis=2).astype(k.dtype)
        dv = dv.reshape(B, Hkv, group, Skv, D).sum(axis=2).astype(v.dtype)
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q, k, v, *, causal: bool = False,
    q_segment_ids=None, kv_segment_ids=None, kv_mask=None,
    scale: Optional[float] = None, q_offset: int = 0,
    block_q: int = 512, block_k: int = 1024, interpret: Optional[bool] = None,
):
    """Flash attention. q: (B, Sq, Hq, D); k, v: (B, Skv, Hkv, D).

    Raises NotImplementedError for shapes the kernel does not serve (tiny
    sequences, single-token decode, dynamic q_offset) — the dispatcher
    routes those to the XLA path.
    """
    B, Sq, Hq, D = q.shape
    _, Skv, Hkv, _ = k.shape
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if Sq < 8 or Skv < 128:
        raise NotImplementedError("sequence too small for the flash kernel")
    if not interpret and D % 128 != 0:
        # Mosaic block layouts need a 128-aligned lane dim; tiny head dims
        # (tests) and the ViT's 80 route to the XLA path instead
        raise NotImplementedError(f"head_dim {D} not 128-aligned")
    if Hq % Hkv != 0:
        raise NotImplementedError("Hq must be a multiple of Hkv")
    if not isinstance(q_offset, int):
        raise NotImplementedError("q_offset must be static")
    block_q = _pick_block(Sq, block_q)
    block_k = _pick_block(Skv, block_k)
    if Sq % block_q or Skv % block_k:
        raise NotImplementedError(f"sizes {Sq}/{Skv} not blockable")
    if scale is None:
        scale = D ** -0.5

    q_seg, kv_seg = _segments(q_segment_ids, kv_segment_ids, kv_mask, B, Sq, Skv)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _flash(qt, kt, vt, q_seg, kv_seg, float(scale), bool(causal),
                 int(q_offset), block_q, block_k, bool(interpret))
    return out.transpose(0, 2, 1, 3)
