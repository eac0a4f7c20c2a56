"""Core functional layers. Params are nested dicts of jnp arrays.

Weight layout conventions (chosen to match HF checkpoints after a transpose):
- dense kernel: (in_features, out_features); HF stores (out, in).
- embedding: (vocab, dim).
- rms_norm scale: (dim,).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_init(key, in_dim: int, out_dim: int, use_bias: bool = True,
               dtype=jnp.float32, scale: float | None = None):
    """He/lecun-style truncated-normal init (stddev 1/sqrt(in_dim) default)."""
    if scale is None:
        scale = in_dim ** -0.5
    kernel = jax.random.truncated_normal(key, -2.0, 2.0, (in_dim, out_dim)) * scale
    p = {"kernel": kernel.astype(dtype)}
    if use_bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def dense(params, x, precision=None):
    if "kernel_q8" in params:  # weight-only int8 (ops/quant.py)
        from spacer_tpu.ops.quant import dense_q8

        return dense_q8(params, x)
    if "kernel_q4" in params:  # packed int4 (ops/quant.py + int4_matmul)
        from spacer_tpu.ops.quant import dense_q4

        return dense_q4(params, x)
    y = jnp.dot(x, params["kernel"], precision=precision)
    if "bias" in params:
        y = y + params["bias"]
    return y


def embed_init(key, vocab: int, dim: int, dtype=jnp.float32):
    table = jax.random.normal(key, (vocab, dim)) * 0.02
    return {"embedding": table.astype(dtype)}


def embed(params, ids):
    return jnp.take(params["embedding"], ids, axis=0)


def rms_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype)}


def layer_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params, x, eps: float = 1e-6):
    """LayerNorm with float32 statistics (torch nn.LayerNorm numerics)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return (params["scale"] * x.astype(dtype) + params["bias"]).astype(dtype)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def rms_norm(params, x, eps: float = 1e-6):
    """RMSNorm with float32 statistics (matches Qwen2RMSNorm numerics)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (params["scale"] * x.astype(dtype)).astype(dtype)
