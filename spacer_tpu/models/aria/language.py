"""Aria text model: Llama-style decoder with MoE feed-forward.

Behavioral reference: transformers modeling_aria.py (AriaTextAttention
:497-566, AriaTextDecoderLayer :568-625, AriaTextModel :700-783,
AriaTextForCausalLM :786-858).  The compute engine is the shared decoder in
models/qwen25_vl/language.py — Aria's plain RoPE rides the M-RoPE path with
all three position rows equal (mrope_section puts every rotary channel on
axis 0), and the MoE feed-forward (ops/moe.py) is selected by
cfg.moe_topk > 0.  The shared-prefix grouped decode and KV cache layouts
are therefore identical across model families.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from spacer_tpu.models.aria.config import AriaTextConfig
from spacer_tpu.models.qwen25_vl.language import (  # noqa: F401  (re-exports)
    init_kv_cache,
    lm_decode_step,
    lm_decode_step_split,
    lm_forward,
    split_layers,
)
from spacer_tpu.nn.core import dense_init, embed_init, rms_norm_init
from spacer_tpu.ops.moe import init_moe_params

Params = Any


def init_lm_params(key, cfg: AriaTextConfig, dtype=jnp.float32) -> Params:
    """Stacked-layer parameter tree for the Aria MoE decoder."""
    keys = jax.random.split(key, 6)
    D = cfg.hidden_size
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    L = cfg.num_layers
    bias = cfg.attention_bias

    def stack_init(fn, key, *args, **kw):
        ks = jax.random.split(key, L)
        return jax.tree.map(
            lambda *xs: jnp.stack(xs), *[fn(k, *args, **kw) for k in ks]
        )

    params = {
        "embed_tokens": embed_init(keys[0], cfg.vocab_size, D, dtype),
        "layers": {
            "input_layernorm": {"scale": jnp.ones((L, D), dtype)},
            "post_attention_layernorm": {"scale": jnp.ones((L, D), dtype)},
            "self_attn": {
                "q_proj": stack_init(dense_init, keys[1], D, H * Dh, bias, dtype),
                "k_proj": stack_init(dense_init, keys[2], D, Hkv * Dh, bias, dtype),
                "v_proj": stack_init(dense_init, keys[3], D, Hkv * Dh, bias, dtype),
                "o_proj": stack_init(dense_init, keys[4], H * Dh, D, False, dtype),
            },
            "mlp": stack_init(
                init_moe_params, keys[5], D, cfg.intermediate_size,
                cfg.moe_num_experts, cfg.moe_num_shared_experts, dtype,
            ),
        },
        "norm": rms_norm_init(D, dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense_init(
            jax.random.fold_in(key, 99), D, cfg.vocab_size, False, dtype
        )
    return params


def positions_1d_to_3d(position_ids):
    """(B, S) plain positions -> (3, B, S) for the shared M-RoPE engine.

    With identical rows, the engine's section mixing reproduces plain RoPE
    exactly (every rotary channel reads axis 0)."""
    return jnp.broadcast_to(position_ids[None], (3,) + position_ids.shape)
