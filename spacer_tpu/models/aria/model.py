"""Combined Aria model: vision tower + projector + MoE LM.

Behavioral reference: modeling_aria.py AriaModel.forward (:1001-1060) —
projector outputs replace the <|img|> placeholder embeddings
(get_placeholder_mask :977-999, masked_scatter :1036-1039), then the text
model runs with plain 1D positions.

Same functional surface as models/qwen25_vl/model.py so the sampler,
trainer, and eval engine drive both families through one code path.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from spacer_tpu.models.aria.config import AriaConfig
from spacer_tpu.models.aria.language import (
    init_kv_cache,
    init_lm_params,
    lm_forward as _lm_forward,
    positions_1d_to_3d,
)
from spacer_tpu.models.aria.vision import (
    init_projector_params,
    init_vit_params,
    projector_forward,
    vit_forward,
)
from spacer_tpu.nn.core import embed

Params = Any

lm_forward = _lm_forward


def init_params(key, cfg: AriaConfig, dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "model": init_lm_params(k1, cfg.text, dtype),
        "visual": init_vit_params(k2, cfg.vision, dtype),
        "projector": init_projector_params(k3, cfg, dtype),
    }


def encode_vision(params, cfg: AriaConfig, pixel_values, position_ids,
                  patch_mask=None, remat: bool = False):
    """pixel_values (N, H, W, C) -> (N*Q, text_hidden) projector features.

    position_ids/patch_mask come from the processor (host-side NaViT
    bucketing, vision.py vision_position_ids).  The projector consumes the
    tower's LAST ENCODER LAYER output (pre post-layernorm) — HF
    vision_feature_layer=-1 (modeling_aria.py:966-974).
    """
    feats, _ = vit_forward(
        params["visual"], cfg.vision, pixel_values, position_ids,
        patch_mask=patch_mask, remat=remat,
    )
    out = projector_forward(params["projector"], cfg, feats,
                            patch_mask=patch_mask)
    return out.reshape(-1, out.shape[-1])


def merge_vision_embeds(cfg: AriaConfig, input_ids, token_embeds,
                        vision_embeds):
    """Scatter projector outputs over <|img|> placeholder positions
    (masked_scatter contract: batch-major order)."""
    B, S, D = token_embeds.shape
    is_vision = input_ids == cfg.image_token_id
    flat_mask = is_vision.reshape(-1)
    idx = jnp.cumsum(flat_mask) - 1
    idx = jnp.clip(idx, 0, vision_embeds.shape[0] - 1)
    gathered = vision_embeds[idx].reshape(B, S, D)
    return jnp.where(is_vision[..., None],
                     gathered.astype(token_embeds.dtype), token_embeds)


def forward(
    params: Params,
    cfg: AriaConfig,
    input_ids,                      # (B, S)
    *,
    pixel_values=None,              # (N, H, W, C) image crops
    pixel_position_ids=None,        # (N, Hp*Wp) NaViT bucketed ids
    patch_mask=None,                # (N, Hp*Wp) bool
    vision_embeds=None,             # precomputed (N*Q, D) alternative
    position_ids=None,              # (3, B, S) (rows equal) or (B, S)
    kv_mask=None,
    cache=None,
    cache_index: int = 0,
    logits: bool = True,
    remat: bool = False,
    attn_impl: Optional[str] = None,
):
    """Full multimodal forward -> (logits, new_cache)."""
    token_embeds = embed(params["model"]["embed_tokens"], input_ids)
    if vision_embeds is None and pixel_values is not None:
        vision_embeds = encode_vision(
            params, cfg, pixel_values, pixel_position_ids,
            patch_mask=patch_mask, remat=remat,
        )
    if vision_embeds is not None:
        token_embeds = merge_vision_embeds(
            cfg, input_ids, token_embeds, vision_embeds
        )
    if position_ids is not None and position_ids.ndim == 2:
        position_ids = positions_1d_to_3d(position_ids)
    return _lm_forward(
        params["model"], cfg.text,
        input_embeds=token_embeds, position_ids=position_ids,
        kv_mask=kv_mask, cache=cache, cache_index=cache_index,
        logits=logits, remat=remat, attn_impl=attn_impl,
    )


def make_kv_cache(cfg: AriaConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16):
    return init_kv_cache(cfg.text, batch, max_len, dtype)
