"""Weight-only int8 quantization for the rollout/decode path.

Decode is weight-bandwidth-bound: every generated token streams the full
parameter set from HBM.  Symmetric per-output-channel int8 halves those
bytes (and the MXU natively consumes the int8->bf16 converted operand), at
~0.4% RMS weight error.  This is the TPU analogue of vLLM's weight-only
quantized serving modes; training and logp computation stay bf16 — GRPO's
importance weights are computed by the train step's own forward, so
quantization only perturbs the SAMPLING distribution, not the gradient
estimator's correctness.

Param convention: a quantized dense dict carries "kernel_q8" (int8, same
shape as the original kernel) and "q8_scale" (f32, broadcastable per
output channel); nn.core.dense dispatches on the key.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = Any


def quantize_dense_int8(p: Params) -> Params:
    """{"kernel": (..., in, out), [bias]} -> int8 weight dict.

    Per-output-channel symmetric: scale[j] = max_i |w[..., i, j]| / 127.
    Already-quantized dicts (kernel_q8 present, e.g. loaded from an int8
    checkpoint) pass through untouched.
    """
    if "kernel_q8" in p:
        return p
    k = p["kernel"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(k), axis=-2, keepdims=True) / 127.0
    q = jnp.round(k / jnp.maximum(scale, 1e-12))
    out = {
        "kernel_q8": jnp.clip(q, -127, 127).astype(jnp.int8),
        "q8_scale": scale,
    }
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def dense_q8(params: Params, x):
    """y = (x @ dequant(kernel)) [+ bias], with the int8->activation-dtype
    convert fused into the matmul operand load by XLA."""
    y = jnp.dot(x, params["kernel_q8"].astype(x.dtype))
    y = y * params["q8_scale"].astype(y.dtype)
    if "bias" in params:
        y = y + params["bias"]
    return y


def quantize_kv(x):
    """(…, Dh) KV block -> (int8 codes, f32 per-vector scale (…,)).

    Per-(position, head) symmetric quantization of a KV cache block.  The
    scale NEVER enters the attention matmuls: for K it multiplies the
    logits after q·k_q8 (logit[p] = scale[p]·(q·k_q8[p])), for V it folds
    into the softmax probs before probs·v_q8 — so the int8->bf16 convert of
    the codes fuses into the matmul operand load and the dequantized cache
    is never materialized.
    """
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = a / 127.0
    q = jnp.round(x.astype(jnp.float32) / jnp.maximum(scale, 1e-12)[..., None])
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def _is_dense(node) -> bool:
    return isinstance(node, dict) and "kernel" in node


def quantize_tree_int8(tree: Params,
                       skip_names=("router", "experts")) -> Params:
    """Quantize every dense kernel in a param subtree (stacked or not).

    `skip_names`: dict keys whose subtrees stay full-precision — the MoE
    router (a routing flip is a bigger perturbation than any matmul error)
    and the grouped-GEMM expert weights (ragged_dot reads its rhs operand
    directly; a dequant there would materialize a full bf16 copy).
    """
    def walk(node, skip):
        if skip:
            return node
        if _is_dense(node):
            return quantize_dense_int8(node)
        if isinstance(node, dict):
            return {
                k: walk(v, k in skip_names) for k, v in node.items()
            }
        return node

    return walk(tree, False)


def quantize_decode_weights(layer_params: Params, lm_head: Params | None):
    """int8-quantize the decode-path weights in one place: the stacked
    decoder-layer tree plus (when untied) the lm_head dense.

    Shared by all three decode paths — the grouped sampler loop
    (sampler/sampler.py), the speculative loop (sampler/speculating.py)
    and the serving batcher (serving/batcher.py) — so what "int8 weights"
    means (incl. the MoE router/expert skip list) cannot silently diverge
    between them.  Returns (layer_params_q, lm_head_q-or-None).
    """
    layer_params = quantize_tree_int8(layer_params)
    if lm_head is not None:
        lm_head = quantize_dense_int8(lm_head)
    return layer_params, lm_head
