"""Packed-int4 weight matmul (TPU Pallas) for the decode path.

Decode streams the full parameter set from HBM every generated token, so
weight bytes ARE the decode time (measured v5e 2026-08-20: bf16 -> int8
weights+KV moves the headline rollout 5.3 -> 3.4 s/iteration, a marginal
~890 GB/s — HBM-roofline).  int4 halves the weight bytes again.  The
catch: this backend cannot hold native S4 arrays (the relay plugin
recurses in device_put), and an XLA-level nibble unpack materializes a
full int8/bf16 copy — both nibbles' dot operands would re-read the packed
bytes, erasing the win.  So the codes live PACKED in an ordinary int8
array (two 4-bit codes per byte) and this kernel unpacks them in VMEM:
one HBM read of K*N/2 bytes per matmul, MXU dots in bf16.

Quantization scheme (ops/quant.py quantize_dense_int4): symmetric 4-bit
codes in [-7, 7] under a rank-1 scale, w ~ q * row_scale[k] *
col_scale[n].  The row scale folds into the ACTIVATION (one VPU multiply
on (M, K) — activations are tiny next to weights at decode), the column
scale into the output, so the kernel itself is scale-free.  Rollout-only,
like int8 (ops/quant.py module docstring): training and logp stay bf16,
so int4 perturbs the sampling distribution only — gate behind the same
A/B protocol that admitted int8_kv.

Packing layout (block-local half pairing, `pack_int4`): within each
K-block of `_block_k(K)` rows, byte r holds code[r] in the low nibble and
code[r + bk/2] in the high nibble.  The kernel then contracts
x[:, :bk/2] @ lo + x[:, bk/2:] @ hi — contiguous halves, no in-kernel
interleave or strided reads.

Role parity: vLLM's int4 weight-only serving modes (AWQ/GPTQ class) in
the reference's rollout-engine role (vllm_grpo_trainer_modified.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_k(K: int) -> int:
    """Deterministic K-block: packing and matmul must agree, so both
    derive it from K alone."""
    for bk in (1024, 512, 256):
        if K % bk == 0:
            return bk
    if K % 2:
        raise ValueError(f"int4 packing needs even K, got {K}")
    return K


def _block_n(N: int) -> int:
    for bn in (1024, 512, 256, 128):
        if N % bn == 0:
            return bn
    return N


def pack_int4(codes):
    """(..., K, N) int4 codes (int8 storage, in [-8, 7]) -> (..., K/2, N)
    packed bytes with block-local half pairing."""
    *lead, K, N = codes.shape
    bk = _block_k(K)
    h = bk // 2
    c = codes.reshape(*lead, K // bk, 2, h, N)
    lo, hi = c[..., 0, :, :], c[..., 1, :, :]
    byte = (lo & 0xF) | (hi << 4)
    return byte.astype(jnp.int8).reshape(*lead, K // 2, N)


def unpack_int4(packed, K: int):
    """Inverse of pack_int4: (..., K/2, N) bytes -> (..., K, N) int8 codes."""
    *lead, K2, N = packed.shape
    assert K2 * 2 == K, (packed.shape, K)
    bk = _block_k(K)
    h = bk // 2
    v = packed.astype(jnp.int32).reshape(*lead, K // bk, h, N)
    lo = ((v & 15) ^ 8) - 8
    hi = v >> 4
    c = jnp.stack([lo, hi], axis=-3)  # (..., K//bk, 2, h, N)
    return c.reshape(*lead, K, N).astype(jnp.int8)


def _kernel(x_ref, p_ref, o_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    # int32 unpack: Mosaic cannot legalize shifts on int8 vectors
    # (arith.shli fails to legalize, measured 2026-08-20), so the bytes
    # widen to i32 lanes first; <<28 >>28 sign-extends the low nibble in
    # two ops
    v = p_ref[...].astype(jnp.int32)          # (bk/2, bn) packed bytes
    lo = ((v << 28) >> 28).astype(jnp.bfloat16)
    hi = (v >> 4).astype(jnp.bfloat16)
    x = x_ref[...].astype(jnp.bfloat16)       # (M, bk)
    h = x.shape[1] // 2
    acc = jax.lax.dot_general(
        x[:, :h], lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(
        x[:, h:], hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] += acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matmul(x, packed, *, interpret: bool = False):
    """y = x @ unpack(packed), f32 accumulation, bf16 MXU operands.

    x: (M, K) — M a multiple of 8 (caller pads); packed: (K/2, N) from
    pack_int4.  Returns (M, N) f32 (callers fold the column scale in and
    cast).  Shapes must be kernel-tile-legal (`int4_kernel_legal`);
    callers fall back to the XLA reference otherwise.
    """
    M, K = x.shape
    K2, N = packed.shape
    assert K2 * 2 == K, (x.shape, packed.shape)
    bk, bn = _block_k(K), _block_n(N)
    grid = (N // bn, K // bk)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, bk), lambda j, k: (0, k)),
            pl.BlockSpec((bk // 2, bn), lambda j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, packed)


def int4_matmul_reference(x, packed):
    """XLA reference: unpack + dot.  Bit-matches the kernel's math (same
    bf16 operands, f32 accumulation); used on CPU and for tile-illegal
    shapes.  Perf note: XLA materializes the unpacked codes, so this path
    has int8-level HBM traffic — correctness fallback, not the fast path."""
    K = x.shape[-1]
    w = unpack_int4(packed, K).astype(jnp.bfloat16)
    return jnp.dot(x.astype(jnp.bfloat16), w,
                   preferred_element_type=jnp.float32)


def int4_kernel_legal(K: int, N: int) -> bool:
    """Tile legality on real TPU: the packed block's last-two dims must be
    (32k, 128k)-aligned or cover the full axis, and K must split into two
    MXU-friendly halves."""
    if K % 2:
        return False
    bk, bn = _block_k(K), _block_n(N)
    half = bk // 2
    if half % 32 and bk != K:
        return False
    if bn % 128 and bn != N:
        return False
    # the x block's lane dim is bk: 128-aligned or the whole K axis
    if bk % 128 and bk != K:
        return False
    return True
