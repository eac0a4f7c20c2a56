"""Mixture-of-Experts feed-forward ops, TPU-first.

Behavioral reference: transformers modeling_aria.py AriaTextMoELayer
(:347-414 top-k routing + Megatron-style token permutation,
AriaGroupedExpertsMLP :316-345 fc1->chunk(projection,gate)->silu(p)*g->fc2,
AriaSharedExpertsMLP :211-234).  The reference permutes tokens on the host
and loops experts with sequential GEMMs (or the grouped_gemm CUDA lib);
here the grouped GEMM is `jax.lax.ragged_dot` — XLA's native ragged
matmul, which tiles expert-contiguous rows straight onto the MXU — and the
permutation is an argsort that stays on device.

Two compute paths:

- `moe_mlp`: dropless (every routed token is computed).  Tokens sorted by
  expert id; two ragged_dots.  Static shapes throughout (T*K rows).  Used
  single-device and under FSDP/ZeRO sharding (expert weights shard on the
  expert axis; XLA all-gathers per layer on use, exactly the ZeRO-3
  contract of the reference's local_scripts/zero3.json).

- `moe_mlp_ep` (see spacer_tpu/parallel/expert.py): true expert
  parallelism under shard_map — expert weights stay put, tokens move over
  ICI (all_gather in, psum out) with a per-device capacity bound.

Routing math (softmax over the top-k logits, NOT over all experts) follows
AriaTextMoELayer.forward:385-388 exactly.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = Any


def init_moe_params(key, hidden: int, intermediate: int, num_experts: int,
                    num_shared: int, dtype=jnp.float32) -> Params:
    """Parameter tree mirroring the HF Aria MoE layer.

    fc1: (E, D, 2I) producing [projection, gate] chunks (HF layout);
    fc2: (E, I, D).  Shared experts are one fused SwiGLU MLP at width
    I * num_shared.  Router: (D, E), no bias.
    """
    ks = jax.random.split(key, 6)
    D, I, E = hidden, intermediate, num_experts
    Is = I * num_shared
    s = D ** -0.5

    def tn(k, shape, scale):
        return (jax.random.truncated_normal(k, -2.0, 2.0, shape) * scale).astype(dtype)

    return {
        "router": {"kernel": tn(ks[0], (D, E), s)},
        "experts": {
            "fc1": {"kernel": tn(ks[1], (E, D, 2 * I), s)},
            "fc2": {"kernel": tn(ks[2], (E, I, D), I ** -0.5)},
        },
        "shared": {
            "gate_proj": {"kernel": tn(ks[3], (D, Is), s)},
            "up_proj": {"kernel": tn(ks[4], (D, Is), s)},
            "down_proj": {"kernel": tn(ks[5], (Is, D), Is ** -0.5)},
        },
    }


def route_topk(router_kernel, x, topk: int):
    """x: (T, D) -> (scores (T, K) f32, indices (T, K) i32).

    Logits in f32; softmax over the K selected logits only
    (modeling_aria.py:385-388).
    """
    logits = jnp.dot(x.astype(jnp.float32), router_kernel.astype(jnp.float32))
    top_logits, top_idx = jax.lax.top_k(logits, topk)
    scores = jax.nn.softmax(top_logits, axis=-1)
    return scores, top_idx.astype(jnp.int32)


def expert_ffn_ragged(fc1_kernel, fc2_kernel, tokens, group_sizes):
    """Grouped SwiGLU over expert-contiguous rows.

    tokens: (M, D) rows sorted by expert; group_sizes: (E,) rows per expert
    (rows past sum(group_sizes) yield zeros).  fc1 (E, D, 2I), fc2 (E, I, D).
    f32 accumulation on the MXU via preferred_element_type.
    """
    h = jax.lax.ragged_dot(
        tokens, fc1_kernel.astype(tokens.dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    proj, gate = jnp.split(h, 2, axis=-1)
    h = (jax.nn.silu(proj) * gate).astype(tokens.dtype)
    out = jax.lax.ragged_dot(
        h, fc2_kernel.astype(tokens.dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    return out


def expert_ffn_dense(fc1_kernel, fc2_kernel, tokens, one_hot):
    """Oracle path: every expert computed on every token, masked-combined.

    one_hot: (M, E) f32 row-to-expert assignment.  O(M*E) flops — tests and
    tiny decode shapes only (SPACER_MOE_IMPL=dense).
    """
    # (E, M, 2I)
    h = jnp.einsum("md,edi->emi", tokens.astype(jnp.float32),
                   fc1_kernel.astype(jnp.float32))
    proj, gate = jnp.split(h, 2, axis=-1)
    h = jax.nn.silu(proj) * gate
    out = jnp.einsum("emi,eid->emd", h, fc2_kernel.astype(jnp.float32))
    return jnp.einsum("emd,me->md", out, one_hot.astype(jnp.float32))


def moe_mlp(params: Params, x, *, topk: int, impl: str | None = None,
            capacity_factor: float = 2.0, ep_axis="fsdp"):
    """MoE feed-forward.  x: (..., D) -> (..., D).

    Matches AriaTextMoELayer.forward end to end: top-k softmax routing,
    per-token weighted combine of expert outputs, plus the shared-experts
    SwiGLU on the raw input.

    impl: "ragged" (dropless grouped GEMM, default) | "dense" (oracle) |
    "ep" (expert-parallel capacity dispatch, see moe_mlp_ep).  Resolved to
    a concrete string by the caller BEFORE tracing (AriaTextConfig reads
    the SPACER_MOE_IMPL env override at construction) — an env read here
    would be baked in at first trace and silently ignored afterwards.
    """
    impl = impl or "ragged"
    if impl == "ep":
        return moe_mlp_ep(params, x, topk=topk,
                          capacity_factor=capacity_factor, ep_axis=ep_axis)
    orig_shape = x.shape
    D = orig_shape[-1]
    xt = x.reshape(-1, D)
    T = xt.shape[0]
    E = params["router"]["kernel"].shape[-1]

    scores, top_idx = route_topk(params["router"]["kernel"], xt, topk)

    flat_expert = top_idx.reshape(-1)                       # (T*K,)
    sort_ids = jnp.argsort(flat_expert, stable=True)        # rows by expert
    permuted = jnp.take(xt, sort_ids // topk, axis=0)       # (T*K, D)
    group_sizes = jnp.bincount(flat_expert, length=E).astype(jnp.int32)

    if impl == "dense":
        one_hot = jax.nn.one_hot(jnp.take(flat_expert, sort_ids), E,
                                 dtype=jnp.float32)
        expert_out = expert_ffn_dense(
            params["experts"]["fc1"]["kernel"],
            params["experts"]["fc2"]["kernel"], permuted, one_hot)
    else:
        expert_out = expert_ffn_ragged(
            params["experts"]["fc1"]["kernel"],
            params["experts"]["fc2"]["kernel"], permuted, group_sizes)

    # unpermute and combine with routing scores (f32 accumulate)
    inv = jnp.zeros((T * topk, expert_out.shape[-1]), jnp.float32)
    inv = inv.at[sort_ids].set(expert_out.astype(jnp.float32))
    combined = (inv.reshape(T, topk, -1) * scores[..., None]).sum(axis=1)

    shared = shared_expert_mlp(params["shared"], xt)
    out = combined.astype(x.dtype) + shared
    return out.reshape(orig_shape)


def shared_expert_mlp(params: Params, x):
    """SwiGLU shared-experts MLP (AriaSharedExpertsMLP).

    Uses nn.core.dense so int8 weight-only-quantized subtrees (kernel_q8
    from ops/quant.py, as produced for the rollout decode loop) dispatch
    transparently."""
    from spacer_tpu.nn.core import dense

    gate = jax.nn.silu(dense(params["gate_proj"], x))
    up = dense(params["up_proj"], x)
    return dense(params["down_proj"], gate * up)


# ---------------------------------------------------------------------------
# Expert-parallel path (GShard-style capacity dispatch under GSPMD)
# ---------------------------------------------------------------------------


def _constraint(x, spec):
    """Apply a sharding constraint when running under a mesh; no-op
    otherwise (single-device tests, plain jit)."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or not mesh.shape_tuple:
            return x
        names = {n for axes in spec for n in (
            (axes,) if isinstance(axes, str) else tuple(axes or ()))}
        if not names.issubset(set(mesh.axis_names)):
            return x
        return jax.lax.with_sharding_constraint(x, spec)
    except Exception:
        return x


def moe_capacity(num_tokens: int, topk: int, num_experts: int,
                 capacity_factor: float) -> int:
    """Per-expert row budget: cf * perfectly-balanced load, lane-rounded."""
    per_expert = num_tokens * topk / num_experts
    c = int(np.ceil(per_expert * capacity_factor))
    return max(8, min(num_tokens * topk, -(-c // 8) * 8))


def moe_mlp_ep(params: Params, x, *, topk: int,
               capacity_factor: float = 2.0, ep_axis="fsdp"):
    """Expert-parallel MoE feed-forward (GShard dispatch-einsum pattern).

    Unlike `moe_mlp` (dropless local compute with ZeRO-gathered weights),
    this formulation keeps each expert's weights resident on its owner
    device and moves TOKENS over ICI: one-hot dispatch tensors route every
    (token, k) assignment into a per-expert capacity buffer, XLA's SPMD
    partitioner turns the dispatch/combine einsums into all-to-alls over
    `ep_axis`, and the grouped SwiGLU runs as two batched matmuls sharded
    on the expert axis.  Token assignments beyond `capacity_factor` x the
    balanced load are DROPPED (only the shared-experts output remains) —
    the standard capacity trade; tests use ample capacity for exactness.

    Routing math is identical to moe_mlp (modeling_aria.py:385-388).
    """
    orig_shape = x.shape
    D = orig_shape[-1]
    xt = x.reshape(-1, D)
    T = xt.shape[0]
    E = params["router"]["kernel"].shape[-1]
    K = topk
    C = moe_capacity(T, K, E, capacity_factor)

    scores, top_idx = route_topk(params["router"]["kernel"], xt, K)

    flat_e = top_idx.reshape(-1)                              # (T*K,)
    assign_oh = jax.nn.one_hot(flat_e, E, dtype=jnp.float32)  # (T*K, E)
    # position of each assignment within its expert, in flat order
    pos = jnp.cumsum(assign_oh, axis=0) - 1.0                 # (T*K, E)
    pos = jnp.sum(pos * assign_oh, axis=-1)                   # (T*K,)
    keep = pos < C
    pos_oh = jax.nn.one_hot(pos.astype(jnp.int32), C,
                            dtype=x.dtype)                    # (T*K, C)
    dispatch = (assign_oh.astype(x.dtype) * keep[:, None].astype(x.dtype)
                )[:, :, None] * pos_oh[:, None, :]            # (T*K, E, C)

    x_rep = jnp.repeat(xt, K, axis=0)                         # (T*K, D)
    xe = jnp.einsum("kec,kd->ecd", dispatch, x_rep)           # (E, C, D)
    xe = _constraint(xe, jax.sharding.PartitionSpec(ep_axis, None, None))

    fc1 = params["experts"]["fc1"]["kernel"].astype(xe.dtype)  # (E, D, 2I)
    fc2 = params["experts"]["fc2"]["kernel"].astype(xe.dtype)  # (E, I, D)
    h = jnp.einsum("ecd,edi->eci", xe, fc1,
                   preferred_element_type=jnp.float32)
    proj, gate = jnp.split(h, 2, axis=-1)
    h = (jax.nn.silu(proj) * gate).astype(xe.dtype)
    h = _constraint(h, jax.sharding.PartitionSpec(ep_axis, None, None))
    ye = jnp.einsum("eci,eid->ecd", h, fc2,
                    preferred_element_type=jnp.float32)       # (E, C, D)

    y_assign = jnp.einsum("kec,ecd->kd", dispatch.astype(jnp.float32), ye)
    combined = (y_assign.reshape(T, K, D) * scores[..., None]).sum(axis=1)

    shared = shared_expert_mlp(params["shared"], xt)
    out = combined.astype(x.dtype) + shared
    return out.reshape(orig_shape)
