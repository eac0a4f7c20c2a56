"""Fused shared-prefix flash-decode attention kernel (TPU Pallas).

One decode step of the grouped rollout reads, per layer, the whole prefix
KV (shared by the G completions of each prompt) plus every completion's
tail KV.  The XLA einsum path (language.py _decode_layer) is correct but
materializes the f32 logits and probs in HBM between the two matmuls —
at B=8,G=8,P=2048 that is ~25MB of extra HBM traffic per layer per step,
~15%% of the whole decode step's bytes — and it always reads the full tail
BUCKET even when the live completion length is shorter.

This kernel fuses logits -> online-softmax -> value matmul into one VMEM-
resident program per kv-head (the WHOLE batch rides in-cell: a finer
(prompt, kv-head, chunk) grid measured 355us/call vs XLA's 277us at
bench shapes purely from ~1.4us/cell fixed grid overhead) and walks
prefix chunks then tail chunks as the innermost grid axis.  Measured on
the v5e chip (tools/chip_measure_decode.py, 2026-08-18): the grouped
kernel beats XLA 1.07x at int8 / 1.13x at bf16 per layer call, and
end-to-end the head-major flash rollout cuts the headline iteration's
int8 rollout phase 3.99s -> 3.43s (bench.py: 6.27 -> 6.63 samples/s) —
so the Sampler's auto decode_impl now resolves to this kernel on TPU.
The RAGGED serving variant is a dead heat with XLA at serving shapes
(158 vs 158 us int8, 197 vs 197 us bf16), so the ContinuousBatcher's
auto stays on the einsum path.  Properties:

- int8 KV (ops/quant.py quantize_kv codes + per-(position,head) scales)
  dequantizes in VMEM: K scales multiply the f32 logits, V scales fold
  into the probs, the int8->bf16 convert fuses into the matmul operand —
  the same scale-folding contract as the XLA path.
- the live tail length (the decode step counter) is a scalar-prefetch
  argument: tail chunks beyond ceil(step/chunk) clamp their block index
  to the last live chunk, so Pallas re-uses the resident block instead of
  DMA-ing dead bucket space, and `pl.when` skips their compute.  Tail
  reads scale with the LIVE length, not the bucket size.
- the tail matmul runs as ONE batched dot over the B*G completion rows —
  true logits only; a flattened block-diagonal matmul would exp/mask Gx
  more VPU elements than exist, and exp is the decode VPU bottleneck.

Layout contract: HEAD-MAJOR caches — prefix (B, Hkv, P, Dh), tail
(N, Hkv, T, Dh) — so each (b, h) program's chunks are contiguous HBM
slabs; (B, P, Hkv, Dh) would make every 128-lane row a strided 128-byte
read, wasting DMA granularity.  The sampler transposes the prefix cache
once per generate call (amortized over the whole decode) and allocates
tail buffers head-major directly.

Role parity: the decode half of flash-attn / vLLM's paged-attention
kernel in the reference stack (vllm_grpo_trainer_modified.py rollouts);
the shared-prefix grouping itself has no reference counterpart.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e30


def _chunk_for(size: int, candidates=(512, 256, 128)) -> int | None:
    for c in candidates:
        if size % c == 0 and size >= c:
            return c
    return size if size > 0 else None


def _chunk_budget(size: int, rows: int, itemsize: int,
                  budget: int = 2 * 1024 * 1024,
                  candidates=(512, 256, 128)) -> int | None:
    """Largest dividing chunk whose (rows, chunk, 128) K-or-V block stays
    under `budget` bytes — Mosaic double-buffers both K and V, so the
    VMEM bill is ~4x one block; 2MB/block keeps the whole program (q, out,
    scratch, f32 logits included) comfortably inside the ~16MB VMEM.
    When even the smallest dividing candidate busts the budget, return it
    anyway (least-bad block); the full `size` only when nothing divides."""
    fallback = None
    for c in candidates:
        if size % c == 0 and size >= c:
            if rows * c * 128 * itemsize <= budget:
                return c
            fallback = c   # large->small iteration: ends at the smallest
    if fallback is not None:
        return fallback
    return size if size > 0 else None


def flash_decode_supported(P: int, T: int, Dh: int, GQ: int) -> bool:
    """Mosaic-legality gate (CPU interpret mode does not enforce tiling,
    so callers must consult this before taking the kernel path)."""
    # q/out blocks cover the full GQ dim (full-array dims are always
    # tile-legal); the chunked dims must be 128-multiples on real TPU
    return Dh == 128 and P % 128 == 0 and T % 128 == 0 and GQ >= 1


def _kernel(step_ref, q_ref, pk_ref, pv_ref, bias_ref, tk_ref, tv_ref,
            pks_ref, pvs_ref, tks_ref, tvs_ref,
            o_ref, m_sc, l_sc, acc_sc, *,
            NP: int, chunk_p: int, chunk_t: int, B: int, G: int,
            group_q: int, sm_scale: float, quant: bool):
    """One grid step: fold one prefix chunk (c < NP) or one tail chunk
    into the (m, l, acc) online-softmax state for this kv-head.

    The WHOLE batch rides in one program (grid is (Hkv, chunks) only):
    measured on-chip, the per-grid-cell fixed cost (~1.4us: Mosaic loop +
    semaphores + index-map evaluation) dominated a (B, Hkv, chunks) grid
    at decode shapes — 256 cells made the kernel 355us/call vs XLA's
    277us.  Batching B in-cell cuts the cell count ~5x at the same DMA
    volume; all matmuls are batched dots over the B (prefix) or B*G
    (tail) leading dim."""
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    step = step_ref[0]
    nt_live = jnp.maximum((step + chunk_t - 1) // chunk_t, 1)

    @pl.when(c == 0)
    def _init():
        m_sc[...] = jnp.full_like(m_sc, MASK_VALUE)
        l_sc[...] = jnp.zeros_like(l_sc)
        acc_sc[...] = jnp.zeros_like(acc_sc)

    q = q_ref[...]                       # (B, GQ, Dh)
    GQ = q.shape[1]
    Dh = q.shape[2]
    R = B * GQ                           # online-state rows
    cdt = q.dtype

    def fold(s, p_to_out):
        # s: (R, C) f32 masked logits; p_to_out(p f32 (R, C)) -> (R, Dh)
        m_old = m_sc[...]                # (R, 128) broadcast columns
        l_old = l_sc[...]
        m_cur = jnp.max(s, axis=-1, keepdims=True)       # (R, 1)
        m_new = jnp.maximum(m_old, m_cur)                # (R, 128)
        alpha = jnp.exp(m_old[:, :1] - m_new[:, :1])     # (R, 1)
        p = jnp.exp(s - m_new[:, :1])                    # (R, C) f32
        l_new = alpha * l_old[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_sc[...] = acc_sc[...] * alpha + p_to_out(p)
        m_sc[...] = jnp.broadcast_to(m_new[:, :1], m_sc.shape)
        l_sc[...] = jnp.broadcast_to(l_new, l_sc.shape)

    @pl.when(c < NP)
    def _prefix():
        k = pk_ref[...]                  # (B, chunk_p, Dh)
        s = jax.lax.dot_general(
            q, k.astype(cdt), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * sm_scale                     # (B, GQ, chunk_p)
        if quant:
            s = s * pks_ref[...]         # (B, 1, chunk_p) K scales
        s = (s + bias_ref[...]).reshape(R, chunk_p)   # (B, 1, chunk_p) mask

        def p_to_out(p):
            pb = p.reshape(B, GQ, chunk_p)
            if quant:
                pb = pb * pvs_ref[...]   # fold V scales into the probs
            return jax.lax.dot_general(
                pb.astype(cdt), pv_ref[...].astype(cdt),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(R, Dh)

        fold(s, p_to_out)

    @pl.when((c >= NP) & (c - NP < nt_live))
    def _tail():
        # per-completion-row batched q.k — true logits only (a flattened
        # block-diagonal matmul would exp/mask Gx more VPU elements than
        # exist).  Row order matches the prefix phase: q (B, G*group_q, Dh)
        # reshapes to (B*G, group_q, Dh) with b-major, g, then c — exactly
        # tail row b*G+g.
        kt = tk_ref[...]                 # (B*G, chunk_t, Dh)
        N = B * G
        qg = q.reshape(N, group_q, Dh)
        s = jax.lax.dot_general(
            qg, kt.astype(cdt), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * sm_scale                     # (N, group_q, chunk_t)
        if quant:
            s = s * tks_ref[...]         # (N, 1, chunk_t)
        tc = c - NP
        pos = tc * chunk_t + jax.lax.broadcasted_iota(
            jnp.int32, (N, group_q, chunk_t), 2)
        s = jnp.where(pos < step, s, MASK_VALUE).reshape(R, chunk_t)

        def p_to_out(p):
            pg = p.reshape(N, group_q, chunk_t)
            if quant:
                pg = pg * tvs_ref[...]
            return jax.lax.dot_general(
                pg.astype(cdt), tv_ref[...].astype(cdt),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(R, Dh)

        fold(s, p_to_out)

    @pl.when(c == nc - 1)
    def _finalize():
        # fully-masked rows (empty/done serving slots) produce FINITE
        # garbage, not a guaranteed value: every -1e30-masked logit becomes
        # the row max, so p=1 everywhere and the output is the mean of the
        # masked V rows.  Callers MUST discard such rows' outputs (the
        # serving loop does).  The clamp is a belt against l underflowing
        # to 0 in pathological float cases — never NaN out of this kernel.
        denom = jnp.maximum(l_sc[:, :1], 1e-30)
        o_ref[...] = (acc_sc[...] / denom).reshape(o_ref.shape).astype(
            o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group", "group_q", "sm_scale", "interpret"),
)
def flash_decode_attention(
    q,                  # (B, Hkv, GQ, Dh) — GQ = G*group_q rows per prompt
    pk, pv,             # (B, Hkv, P, Dh) bf16, or int8 codes
    bias_p,             # (B, 1, P) f32 additive prefix mask (0 / -1e30)
    tk, tv,             # (N, Hkv, T, Dh) — N = B*G completion rows
    step,               # scalar int32: live tail length (>= 1)
    pk_scale=None, pv_scale=None,   # (B, Hkv, 1, P) f32 for int8 caches
    tk_scale=None, tv_scale=None,   # (N, Hkv, 1, T) f32
    *, group: int, group_q: int, sm_scale: float, interpret: bool = False,
):
    """Fused shared-prefix + per-row-tail decode attention.

    Returns (B, Hkv, GQ, Dh) f32 attention outputs.  Query row g*group_q+c
    of prompt b is head (hkv*group_q + c) of completion row b*group + g.
    """
    B, Hkv, GQ, Dh = q.shape
    P = pk.shape[2]
    T = tk.shape[2]
    G = group
    N = B * G
    quant = pk_scale is not None
    itemsize = 1 if quant else 2
    import os

    budget = int(os.environ.get("SPACER_FLASH_CHUNK_BUDGET",
                                2 * 1024 * 1024))
    chunk_p = _chunk_budget(P, B, itemsize, budget=budget)
    chunk_t = _chunk_budget(T, N, itemsize, budget=budget,
                            candidates=(256, 128))
    NP = P // chunk_p
    NT = T // chunk_t

    def idx_q(h, c, step_ref):
        return (0, h, 0, 0)

    def idx_prefix(h, c, step_ref):
        return (0, h, jnp.minimum(c, NP - 1), 0)

    def idx_bias(h, c, step_ref):
        return (0, 0, jnp.minimum(c, NP - 1))

    def idx_tail(h, c, step_ref):
        nt_live = jnp.maximum((step_ref[0] + chunk_t - 1) // chunk_t, 1)
        tc = jnp.clip(c - NP, 0, nt_live - 1)
        return (0, h, tc, 0)

    def idx_pscale(h, c, step_ref):
        return (0, h, 0, jnp.minimum(c, NP - 1))

    def idx_tscale(h, c, step_ref):
        nt_live = jnp.maximum((step_ref[0] + chunk_t - 1) // chunk_t, 1)
        tc = jnp.clip(c - NP, 0, nt_live - 1)
        return (0, h, 0, tc)

    in_specs = [
        pl.BlockSpec((B, None, GQ, Dh), idx_q),
        pl.BlockSpec((B, None, chunk_p, Dh), idx_prefix),
        pl.BlockSpec((B, None, chunk_p, Dh), idx_prefix),
        pl.BlockSpec((B, 1, chunk_p), idx_bias),
        pl.BlockSpec((N, None, chunk_t, Dh), idx_tail),
        pl.BlockSpec((N, None, chunk_t, Dh), idx_tail),
    ]
    operands = [q, pk, pv, bias_p, tk, tv]
    if quant:
        in_specs += [
            pl.BlockSpec((B, None, 1, chunk_p), idx_pscale),
            pl.BlockSpec((B, None, 1, chunk_p), idx_pscale),
            pl.BlockSpec((N, None, 1, chunk_t), idx_tscale),
            pl.BlockSpec((N, None, 1, chunk_t), idx_tscale),
        ]
        operands += [pk_scale, pv_scale, tk_scale, tv_scale]

    if quant:
        kernel = functools.partial(
            _kernel, NP=NP, chunk_p=chunk_p, chunk_t=chunk_t, B=B, G=G,
            group_q=group_q, sm_scale=sm_scale, quant=True,
        )
    else:
        def kernel(step_ref, q_ref, pk_ref, pv_ref, bias_ref, tk_ref,
                   tv_ref, o_ref, m_sc, l_sc, acc_sc):
            return _kernel(step_ref, q_ref, pk_ref, pv_ref, bias_ref,
                           tk_ref, tv_ref, None, None, None, None,
                           o_ref, m_sc, l_sc, acc_sc, NP=NP,
                           chunk_p=chunk_p, chunk_t=chunk_t, B=B, G=G,
                           group_q=group_q, sm_scale=sm_scale, quant=False)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Hkv, NP + NT),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, None, GQ, Dh), idx_q),
        scratch_shapes=[
            pltpu.VMEM((B * GQ, 128), jnp.float32),
            pltpu.VMEM((B * GQ, 128), jnp.float32),
            pltpu.VMEM((B * GQ, Dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, GQ, Dh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(step, jnp.int32).reshape(1), *operands)
    return out


def _ragged_kernel(q_ref, pk_ref, pv_ref, bias_p_ref, tk_ref, tv_ref,
                   bias_t_ref, pks_ref, pvs_ref, tks_ref, tvs_ref,
                   o_ref, m_sc, l_sc, acc_sc, *,
                   NP: int, chunk_p: int, chunk_t: int, RB: int,
                   group_q: int, sm_scale: float, quant: bool):
    """Clock-ring serving variant: RB independent rows per program, both
    the prefix and the ring masked by per-row additive biases.  Each chunk
    runs as an RB-batched dot (q (RB, group_q, Dh) x k (RB, chunk, Dh)) —
    true logits only; a flattened (RB*group_q, RB*chunk) block-diagonal
    matmul would exp/mask RBx more VPU elements than exist."""
    c = pl.program_id(2)
    nc = pl.num_programs(2)

    @pl.when(c == 0)
    def _init():
        m_sc[...] = jnp.full_like(m_sc, MASK_VALUE)
        l_sc[...] = jnp.zeros_like(l_sc)
        acc_sc[...] = jnp.zeros_like(acc_sc)

    q = q_ref[...].reshape(RB * group_q, q_ref.shape[-1])
    cdt = q.dtype
    GQ = RB * group_q

    def fold(k_ref2, v_ref2, bias_ref2, ks_ref2, vs_ref2, chunk):
        # RB-batched q.k: true logits only (a flattened block-diagonal
        # matmul would exp/mask RBx more VPU elements than exist)
        k = k_ref2[...]                          # (RB, chunk, Dh)
        qg = q.reshape(RB, group_q, q.shape[-1])
        s = jax.lax.dot_general(
            qg, k.astype(cdt), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * sm_scale                             # (RB, group_q, chunk)
        if quant:
            s = s * ks_ref2[...].reshape(RB, 1, chunk)
        s = (s + bias_ref2[...].reshape(RB, 1, chunk)).reshape(GQ, chunk)
        m_old = m_sc[...]
        l_old = l_sc[...]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old[:, :1] - m_new[:, :1])
        p = jnp.exp(s - m_new[:, :1])
        l_new = alpha * l_old[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        pg = p.reshape(RB, group_q, chunk)
        if quant:
            pg = pg * vs_ref2[...].reshape(RB, 1, chunk)
        pv = jax.lax.dot_general(
            pg.astype(cdt), v_ref2[...].astype(cdt),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(GQ, q.shape[-1])
        acc_sc[...] = acc_sc[...] * alpha + pv
        m_sc[...] = jnp.broadcast_to(m_new[:, :1], m_sc.shape)
        l_sc[...] = jnp.broadcast_to(l_new, l_sc.shape)

    @pl.when(c < NP)
    def _prefix():
        fold(pk_ref, pv_ref, bias_p_ref, pks_ref, pvs_ref, chunk_p)

    @pl.when(c >= NP)
    def _ring():
        fold(tk_ref, tv_ref, bias_t_ref, tks_ref, tvs_ref, chunk_t)

    @pl.when(c == nc - 1)
    def _finalize():
        # fully-masked rows produce finite garbage (mean of masked V), not
        # a guaranteed value — see _kernel's finalize note; callers discard
        denom = jnp.maximum(l_sc[:, :1], 1e-30)
        o_ref[...] = (acc_sc[...] / denom).reshape(
            o_ref.shape).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_q", "sm_scale", "interpret"),
)
def flash_ragged_decode_attention(
    q,                  # (R, Hkv, group_q, Dh) — one token per slot row
    pk, pv,             # (R, Hkv, Pmax, Dh) bf16 or int8 codes
    bias_p,             # (R, 1, Pmax) f32 additive prefix mask
    tk, tv,             # (R, Hkv, Cmax, Dh) clock-ring caches
    bias_t,             # (R, 1, Cmax) f32 additive ring-window mask
    pk_scale=None, pv_scale=None,   # (R, Hkv, 1, Pmax) f32 for int8
    tk_scale=None, tv_scale=None,   # (R, Hkv, 1, Cmax) f32
    *, group_q: int, sm_scale: float, interpret: bool = False,
):
    """Fused decode attention for the serving clock-ring layout
    (serving/ragged.py): per-row independent prefix + ring windows, both
    expressed as additive biases.  Returns (R, Hkv, group_q, Dh) f32."""
    R, Hkv, gq, Dh = q.shape
    P = pk.shape[2]
    T = tk.shape[2]
    quant = pk_scale is not None
    chunk_p = _chunk_for(P)
    chunk_t = _chunk_for(T, (256, 128))
    NP = P // chunk_p
    NT = T // chunk_t
    RB = 8 if R % 8 == 0 else (4 if R % 4 == 0 else 1)

    def idx_q(r, h, c):
        return (r, h, 0, 0)

    def idx_prefix(r, h, c):
        return (r, h, jnp.minimum(c, NP - 1), 0)

    def idx_bias_p(r, h, c):
        return (r, 0, jnp.minimum(c, NP - 1))

    def idx_ring(r, h, c):
        return (r, h, jnp.maximum(c - NP, 0), 0)

    def idx_bias_t(r, h, c):
        return (r, 0, jnp.maximum(c - NP, 0))

    def idx_pscale(r, h, c):
        return (r, h, 0, jnp.minimum(c, NP - 1))

    def idx_tscale(r, h, c):
        return (r, h, 0, jnp.maximum(c - NP, 0))

    in_specs = [
        pl.BlockSpec((RB, None, gq, Dh), idx_q),
        pl.BlockSpec((RB, None, chunk_p, Dh), idx_prefix),
        pl.BlockSpec((RB, None, chunk_p, Dh), idx_prefix),
        pl.BlockSpec((RB, 1, chunk_p), idx_bias_p),
        pl.BlockSpec((RB, None, chunk_t, Dh), idx_ring),
        pl.BlockSpec((RB, None, chunk_t, Dh), idx_ring),
        pl.BlockSpec((RB, 1, chunk_t), idx_bias_t),
    ]
    operands = [q, pk, pv, bias_p, tk, tv, bias_t]
    if quant:
        in_specs += [
            pl.BlockSpec((RB, None, 1, chunk_p), idx_pscale),
            pl.BlockSpec((RB, None, 1, chunk_p), idx_pscale),
            pl.BlockSpec((RB, None, 1, chunk_t), idx_tscale),
            pl.BlockSpec((RB, None, 1, chunk_t), idx_tscale),
        ]
        operands += [pk_scale, pv_scale, tk_scale, tv_scale]

        kernel = functools.partial(
            _ragged_kernel, NP=NP, chunk_p=chunk_p, chunk_t=chunk_t,
            RB=RB, group_q=gq, sm_scale=sm_scale, quant=True,
        )
    else:
        def kernel(q_ref, pk_ref, pv_ref, bias_p_ref, tk_ref, tv_ref,
                   bias_t_ref, o_ref, m_sc, l_sc, acc_sc):
            return _ragged_kernel(
                q_ref, pk_ref, pv_ref, bias_p_ref, tk_ref, tv_ref,
                bias_t_ref, None, None, None, None, o_ref, m_sc, l_sc,
                acc_sc, NP=NP, chunk_p=chunk_p, chunk_t=chunk_t, RB=RB,
                group_q=gq, sm_scale=sm_scale, quant=False)

    out = pl.pallas_call(
        kernel,
        grid=(R // RB, Hkv, NP + NT),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((RB, None, gq, Dh), idx_q),
        out_shape=jax.ShapeDtypeStruct((R, Hkv, gq, Dh), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((RB * gq, 128), jnp.float32),
            pltpu.VMEM((RB * gq, 128), jnp.float32),
            pltpu.VMEM((RB * gq, Dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return out


def ragged_decode_attention_reference(
    q, pk, pv, bias_p, tk, tv, bias_t,
    pk_scale=None, pv_scale=None, tk_scale=None, tv_scale=None,
    *, group_q: int, sm_scale: float,
):
    """XLA reference for the ring variant (head-major), used for parity
    tests and the non-TPU fallback."""
    cdt = q.dtype
    lp = jnp.einsum("rhgd,rhpd->rhgp", q, pk.astype(cdt),
                    preferred_element_type=jnp.float32) * sm_scale
    lt = jnp.einsum("rhgd,rhtd->rhgt", q, tk.astype(cdt),
                    preferred_element_type=jnp.float32) * sm_scale
    if pk_scale is not None:
        lp = lp * pk_scale
        lt = lt * tk_scale
    lp = lp + bias_p[:, :, None, :]   # (R,1,P) -> (R,1,1,P)
    lt = lt + bias_t[:, :, None, :]
    P = pk.shape[2]
    full = jnp.concatenate([lp, lt], axis=-1)
    probs = jax.nn.softmax(full, axis=-1)
    probs_p, probs_t = probs[..., :P], probs[..., P:]
    if pv_scale is not None:
        probs_p = probs_p * pv_scale
        probs_t = probs_t * tv_scale
    out = (
        jnp.einsum("rhgp,rhpd->rhgd", probs_p.astype(cdt), pv.astype(cdt),
                   preferred_element_type=jnp.float32)
        + jnp.einsum("rhgt,rhtd->rhgd", probs_t.astype(cdt), tv.astype(cdt),
                     preferred_element_type=jnp.float32)
    )
    return out


def decode_attention_reference(
    q, pk, pv, bias_p, tk, tv, step,
    pk_scale=None, pv_scale=None, tk_scale=None, tv_scale=None,
    *, group: int, group_q: int, sm_scale: float,
):
    """XLA reference with identical semantics/signature (head-major), used
    for kernel parity tests and as the non-TPU fallback."""
    B, Hkv, GQ, Dh = q.shape
    G = group
    cdt = q.dtype if q.dtype != jnp.float32 else jnp.float32
    qf = q.reshape(B, Hkv, G, group_q, Dh)
    lp = jnp.einsum("bhgcd,bhpd->bhgcp", qf, pk.astype(cdt),
                    preferred_element_type=jnp.float32) * sm_scale
    if pk_scale is not None:
        lp = lp * pk_scale[:, :, None, :, :]  # (B,Hkv,1,P)->(B,Hkv,1,1,P)
    lp = lp + bias_p[:, None, None, :, :]
    qt = jnp.transpose(qf, (0, 2, 1, 3, 4)).reshape(B * G, Hkv, group_q, Dh)
    tkh = tk.astype(cdt)
    lt = jnp.einsum("nhcd,nhtd->nhct", qt, tkh,
                    preferred_element_type=jnp.float32) * sm_scale
    if tk_scale is not None:
        lt = lt * tk_scale  # (N,Hkv,1,T) broadcasts over group_q
    T = tk.shape[2]
    tmask = jnp.arange(T)[None, None, None, :] < step
    lt = jnp.where(tmask, lt, MASK_VALUE)
    lp_rows = jnp.transpose(lp, (0, 2, 1, 3, 4)).reshape(
        B * G, Hkv, group_q, -1)
    full = jnp.concatenate([lp_rows, lt], axis=-1)
    probs = jax.nn.softmax(full, axis=-1)
    P = pk.shape[2]
    probs_p = probs[..., :P].reshape(B, G, Hkv, group_q, P)
    probs_t = probs[..., P:]
    if pv_scale is not None:
        probs_p = probs_p * pv_scale[:, None, :, 0, None, :]
    if tv_scale is not None:
        probs_t = probs_t * tv_scale
    out_p = jnp.einsum("bghcp,bhpd->bghcd", probs_p.astype(cdt),
                       pv.astype(cdt), preferred_element_type=jnp.float32)
    out_t = jnp.einsum("nhct,nhtd->nhcd", probs_t.astype(cdt),
                       tv.astype(cdt), preferred_element_type=jnp.float32)
    out = out_p.reshape(B * G, Hkv, group_q, Dh) + out_t
    # back to (B, Hkv, GQ, Dh)
    return jnp.transpose(
        out.reshape(B, G, Hkv, group_q, Dh), (0, 2, 1, 3, 4)
    ).reshape(B, Hkv, GQ, Dh)
