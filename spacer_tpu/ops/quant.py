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


def quantize_dense_int4(p: Params) -> Params:
    """{"kernel": (..., K, N), [bias]} -> packed int4 weight dict.

    Rank-1-scaled symmetric 4-bit: w ~ q * row_scale[k] * col_scale[n]
    with codes in [-7, 7].  col = per-output-channel max (like int8), row
    = per-input-row max of the column-normalized weights — the row scale
    folds into the activation, the column scale into the output, so the
    packed matmul kernel (ops/int4_matmul.py) is scale-free.  ~2-4x the
    int8 RMS error; rollout-sampling-only, behind its own A/B.
    """
    if "kernel_q4" in p:
        return p
    k = p["kernel"].astype(jnp.float32)
    col = jnp.max(jnp.abs(k), axis=-2, keepdims=True)      # (..., 1, N)
    u = k / jnp.maximum(col, 1e-12)
    row = jnp.max(jnp.abs(u), axis=-1, keepdims=True)      # (..., K, 1)
    q = jnp.round(7.0 * u / jnp.maximum(row, 1e-12))
    codes = jnp.clip(q, -7, 7).astype(jnp.int8)
    from spacer_tpu.ops.int4_matmul import pack_int4

    out = {
        "kernel_q4": pack_int4(codes),
        "q4_row_scale": row[..., 0],                       # (..., K)
        "q4_col_scale": col[..., 0, :] / 7.0,              # (..., N)
    }
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def dense_q4(params: Params, x):
    """y = (x @ dequant_int4(kernel)) [+ bias] via the packed-nibble
    Pallas kernel on TPU (one K*N/2-byte HBM read); XLA reference on other
    platforms or tile-illegal shapes."""
    from spacer_tpu.ops.int4_matmul import (
        int4_kernel_legal, int4_matmul, int4_matmul_reference,
    )

    packed = params["kernel_q4"]
    *lead, K = x.shape
    N = packed.shape[-1]
    xs = (x * params["q4_row_scale"].astype(x.dtype)).reshape(-1, K)
    M = xs.shape[0]
    pad = (-M) % 8
    if jax.default_backend() == "tpu" and int4_kernel_legal(K, N):
        if pad:
            xs = jnp.pad(xs, ((0, pad), (0, 0)))
        y = int4_matmul(xs, packed)[:M]
    else:
        y = int4_matmul_reference(xs, packed)
    y = (y * params["q4_col_scale"].astype(jnp.float32)).astype(x.dtype)
    y = y.reshape(*lead, N)
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
    return _quantize_tree(tree, quantize_dense_int8, skip_names)


def quantize_tree_int4(tree: Params,
                       skip_names=("router", "experts")) -> Params:
    """int4 variant of quantize_tree_int8 (same skip list); kernels whose
    input dim is odd stay int8 (packing needs even K)."""
    def quant(p):
        if p["kernel"].shape[-2] % 2:
            return quantize_dense_int8(p)
        return quantize_dense_int4(p)

    return _quantize_tree(tree, quant, skip_names)


def _quantize_tree(tree: Params, quant, skip_names) -> Params:
    def walk(node, skip):
        if skip:
            return node
        if _is_dense(node):
            return quant(node)
        if isinstance(node, dict):
            return {
                k: walk(v, k in skip_names) for k, v in node.items()
            }
        return node

    return walk(tree, False)


def quantize_decode_weights(layer_params: Params, lm_head: Params | None,
                            bits: int = 8):
    """Quantize the decode-path weights in one place: the stacked
    decoder-layer tree plus (when untied) the lm_head dense.

    Shared by all three decode paths — the grouped sampler loop
    (sampler/sampler.py), the speculative loop (sampler/speculating.py)
    and the serving batcher (serving/batcher.py) — so what "intN weights"
    means (incl. the MoE router/expert skip list) cannot silently diverge
    between them.  bits=8 or 4.  Returns (layer_params_q, lm_head_q).
    """
    tree_q = {8: quantize_tree_int8, 4: quantize_tree_int4}[bits]
    layer_params = tree_q(layer_params)
    if lm_head is not None:
        dense_q = {8: quantize_dense_int8, 4: quantize_dense_int4}[bits]
        if bits == 4 and lm_head["kernel"].shape[-2] % 2:
            dense_q = quantize_dense_int8
        lm_head = dense_q(lm_head)
    return layer_params, lm_head
