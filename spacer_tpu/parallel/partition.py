"""Parameter partitioning: regex path rules -> PartitionSpec.

FSDP axis shards a weight dimension (XLA inserts allgather-on-use, the SPMD
equivalent of ZeRO-3); tp shards the head/ffn dimension (Megatron-style).
Rules are matched in order against 'a/b/c' param paths; first match wins.
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


# Rules for the Qwen2.5-VL pytree (stacked layer arrays have a leading layer
# axis which is never sharded). Order matters.
# Blockwise-quantized Adam moments (train/optimizer.py scale_by_adam_8bit):
# payloads are FLAT (nb, BLOCK) views of each param, so the param-geometry
# rules don't apply — shard the block-row dim over fsdp (any even split
# stores correctly; XLA reshards grads into this layout inside the apply
# program).  Must match BEFORE the param rules: the payload paths embed the
# param path (".mu_q/model/layers/...").
_QUANT_MOMENT_RULES: list[tuple[str, P]] = [
    (r"\.(mu|nu)_q/", P("fsdp", None)),
    (r"\.(mu|nu)_s/", P("fsdp", None)),
]

QWEN_PARTITION_RULES: list[tuple[str, P]] = _QUANT_MOMENT_RULES + [
    # LM stacked layers: kernels (L, in, out)
    (r"model/layers/self_attn/(q|k|v)_proj/kernel", P(None, "fsdp", "tp")),
    (r"model/layers/self_attn/o_proj/kernel", P(None, "tp", "fsdp")),
    (r"model/layers/self_attn/(q|k|v)_proj/bias", P(None, "tp")),
    (r"model/layers/mlp/(gate|up)_proj/kernel", P(None, "fsdp", "tp")),
    (r"model/layers/mlp/down_proj/kernel", P(None, "tp", "fsdp")),
    (r"model/layers/.*layernorm/scale", P(None, None)),
    # embeddings / head
    (r"model/embed_tokens/embedding", P("tp", "fsdp")),
    (r"model/lm_head/kernel", P("fsdp", "tp")),
    (r"model/norm/scale", P()),
    # ViT stacked blocks
    (r"visual/blocks/attn/qkv/kernel", P(None, "fsdp", "tp")),
    (r"visual/blocks/attn/qkv/bias", P(None, "tp")),
    (r"visual/blocks/attn/proj/kernel", P(None, "tp", "fsdp")),
    (r"visual/blocks/attn/proj/bias", P(None, None)),
    (r"visual/blocks/mlp/(gate|up)_proj/kernel", P(None, "fsdp", "tp")),
    (r"visual/blocks/mlp/(gate|up)_proj/bias", P(None, "tp")),
    (r"visual/blocks/mlp/down_proj/kernel", P(None, "tp", "fsdp")),
    (r"visual/blocks/mlp/down_proj/bias", P(None, None)),
    # Qwen2-VL ViT MLP (fc1/quick_gelu/fc2)
    (r"visual/blocks/mlp/fc1/kernel", P(None, "fsdp", "tp")),
    (r"visual/blocks/mlp/fc1/bias", P(None, "tp")),
    (r"visual/blocks/mlp/fc2/kernel", P(None, "tp", "fsdp")),
    (r"visual/blocks/mlp/fc2/bias", P(None, None)),
    (r"visual/blocks/norm[12]/scale", P(None, None)),
    (r"visual/patch_embed/proj/kernel", P("fsdp", "tp")),
    (r"visual/merger/mlp_0/kernel", P("fsdp", "tp")),
    (r"visual/merger/mlp_0/bias", P("tp")),
    (r"visual/merger/mlp_2/kernel", P("tp", "fsdp")),
    (r"visual/merger/.*", P()),
    # fallback: replicate
    (r".*", P()),
]


# Rules for the Aria MoE pytree.  LM attention paths match the Qwen layout
# (shared decoder engine); the MoE feed-forward shards its EXPERT axis over
# fsdp — under the default dropless impl XLA all-gathers a layer's expert
# weights on use (ZeRO-3), under moe_impl="ep" the same placement keeps each
# expert resident and the dispatch einsums become all-to-alls.  The expert
# matrices' inner dims shard over tp.
ARIA_PARTITION_RULES: list[tuple[str, P]] = _QUANT_MOMENT_RULES + [
    # MoE: router replicated (tiny), experts (L, E, in, out)
    (r"model/layers/mlp/router/kernel", P(None, None, None)),
    (r"model/layers/mlp/experts/fc1/kernel", P(None, "fsdp", None, "tp")),
    (r"model/layers/mlp/experts/fc2/kernel", P(None, "fsdp", "tp", None)),
    (r"model/layers/mlp/shared/(gate|up)_proj/kernel", P(None, "fsdp", "tp")),
    (r"model/layers/mlp/shared/down_proj/kernel", P(None, "tp", "fsdp")),
    # LM attention / norms / embeddings: same geometry as Qwen
    (r"model/layers/self_attn/(q|k|v)_proj/kernel", P(None, "fsdp", "tp")),
    (r"model/layers/self_attn/o_proj/kernel", P(None, "tp", "fsdp")),
    (r"model/layers/self_attn/(q|k|v)_proj/bias", P(None, "tp")),
    (r"model/layers/.*layernorm/scale", P(None, None)),
    (r"model/embed_tokens/embedding", P("tp", "fsdp")),
    (r"model/lm_head/kernel", P("fsdp", "tp")),
    (r"model/norm/scale", P()),
    # Idefics3/SigLIP tower: stacked (L, in, out) kernels
    (r"visual/encoder/self_attn/(q|k|v)_proj/kernel", P(None, "fsdp", "tp")),
    (r"visual/encoder/self_attn/(q|k|v)_proj/bias", P(None, "tp")),
    (r"visual/encoder/self_attn/out_proj/kernel", P(None, "tp", "fsdp")),
    (r"visual/encoder/mlp/fc1/kernel", P(None, "fsdp", "tp")),
    (r"visual/encoder/mlp/fc1/bias", P(None, "tp")),
    (r"visual/encoder/mlp/fc2/kernel", P(None, "tp", "fsdp")),
    (r"visual/embeddings/patch_embedding/kernel", P("fsdp", "tp")),
    (r"visual/embeddings/position_embedding/embedding", P(None, "fsdp")),
    # projector: small, replicate
    (r"projector/.*", P()),
    # fallback: replicate
    (r".*", P()),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _spec_for(path_str: str, leaf, rules) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path_str) or re.search(pattern, path_str):
            return _fit_spec(spec, getattr(leaf, "ndim", 0))
    return P()


def _fit_spec(spec: P, ndim: int) -> P:
    """Trim/pad a spec to the leaf's rank (defensive vs rule/shape drift)."""
    parts = tuple(spec)
    if len(parts) > ndim:
        parts = parts[:ndim]
    return P(*parts)


def partition_spec_tree(params, rules: Sequence[tuple[str, P]] | None = None):
    """Pytree of PartitionSpec matching `params` structure."""
    rules = rules if rules is not None else QWEN_PARTITION_RULES
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(_path_str(path), leaf, rules), params
    )


def _shrink_spec_to_shape(spec: P, shape, mesh) -> P:
    """Drop sharding on dims not divisible by the mesh axis size (tiny test
    models); production shapes always divide."""
    parts = []
    for i, axis in enumerate(tuple(spec)):
        if axis is None:
            parts.append(None)
            continue
        names = (axis,) if isinstance(axis, str) else tuple(axis)
        size = int(np.prod([mesh.shape[n] for n in names]))
        parts.append(axis if shape[i] % size == 0 else None)
    return P(*parts)


def shard_params(params, mesh, rules=None):
    """Device_put params onto the mesh per the partition rules."""
    specs = partition_spec_tree(params, rules)
    specs = jax.tree.map(
        lambda leaf, spec: _shrink_spec_to_shape(spec, leaf.shape, mesh),
        params, specs,
    )
    return (
        jax.tree.map(
            lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
            params, specs,
        ),
        specs,
    )


def batch_spec(mesh) -> P:
    """Batch-dimension spec: data-parallel over data x fsdp."""
    return P(("data", "fsdp"))


# batch keys whose SECOND dim is the batch dimension (e.g. rope position_ids
# are (3, N, S)); everything else shards dim 0.
_BATCH_DIM1_KEYS = frozenset(
    {"position_ids", "prompt_position_ids", "completion_position_ids"}
)
# keys shared by the whole batch (packed patch/crop tokens, not per-row)
_REPLICATED_KEYS = frozenset(
    {"pixel_values", "patch_mask", "pixel_position_ids"}
)


def place_batch(batch: dict, mesh):
    """Explicitly place a host-side train batch onto the mesh.

    Row-indexed arrays shard over the data x fsdp axes (the DP equivalent of
    the reference's 8-process torchrun split, run_SpaceR_SG_RLVR.sh:9-21);
    packed pixel patches replicate (the vision encode output is broadcast to
    every group).  Dims not divisible by the axis size fall back to
    replication rather than erroring (tiny tests / odd G).

    Arrays that are already jax Arrays (e.g. an async-dispatched ref_logps)
    pass through untouched.
    """
    baxes = batch_spec(mesh)[0]
    n_shards = int(np.prod([mesh.shape[a] for a in baxes]))

    def spec_for(k, v):
        if k in _REPLICATED_KEYS:
            return P()
        dim = 1 if k in _BATCH_DIM1_KEYS else 0
        if v.ndim <= dim or v.shape[dim] % n_shards != 0:
            return P()
        return P(*([None] * dim), baxes)

    out = {}
    for k, v in batch.items():
        if isinstance(v, jax.Array) and not isinstance(v, np.ndarray):
            out[k] = v
            continue
        v = np.asarray(v)
        out[k] = jax.device_put(v, NamedSharding(mesh, spec_for(k, v)))
    return out
