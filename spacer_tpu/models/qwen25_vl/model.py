"""Combined Qwen2.5-VL model: ViT encode + scatter into LM token embeds.

Behavioral reference: modeling_qwen2_5_vl.py Qwen2_5_VLModel.forward
(:1216-1330) — vision features replace the <|image_pad|>/<|video_pad|>
placeholder embeddings, position ids come from get_rope_index.

TPU note: unlike the reference trainer (SG_RLVR_trainer.py:516-518), vision
is encoded ONCE per prompt; group-sampling callers broadcast the embeddings
across the G completions instead of tiling pixel tensors x(B*G).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl.config import Qwen25VLConfig
from spacer_tpu.models.qwen25_vl.language import (
    init_kv_cache,
    init_lm_params,
    lm_forward as _lm_forward,
)
from spacer_tpu.models.qwen25_vl.vision import (
    init_vit_params,
    vision_layout,
    vit_forward,
)
from spacer_tpu.nn.core import embed

Params = Any

lm_forward = _lm_forward  # re-export with the combined-model param subtree


def init_params(key, cfg: Qwen25VLConfig, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "model": init_lm_params(k1, cfg.text, dtype),
        "visual": init_vit_params(k2, cfg.vision, dtype),
    }


def encode_vision(params, cfg: Qwen25VLConfig, pixel_values, grid_thw,
                  remat: bool = False, attn_impl=None):
    """pixel_values (S, patch_dim) + grid_thw list -> (S/mu, lm_hidden)."""
    layout = vision_layout(grid_thw, cfg.vision)
    return vit_forward(
        params["visual"], cfg.vision, pixel_values, layout,
        remat=remat, attn_impl=attn_impl,
    )


def merge_vision_embeds(cfg: Qwen25VLConfig, input_ids, token_embeds,
                        vision_embeds):
    """Scatter vision embeddings over placeholder positions.

    input_ids: (B, S); token_embeds: (B, S, D); vision_embeds: (N, D) where
    N == total number of image+video placeholder tokens in the batch, in
    batch-major order (the HF masked_scatter contract).
    """
    B, S, D = token_embeds.shape
    is_vision = (input_ids == cfg.image_token_id) | (
        input_ids == cfg.video_token_id
    )
    flat_mask = is_vision.reshape(-1)
    # positions of vision tokens in flattened order -> index into vision_embeds
    idx = jnp.cumsum(flat_mask) - 1
    idx = jnp.clip(idx, 0, vision_embeds.shape[0] - 1)
    gathered = vision_embeds[idx].reshape(B, S, D)
    return jnp.where(is_vision[..., None], gathered.astype(token_embeds.dtype),
                     token_embeds)


def forward(
    params: Params,
    cfg: Qwen25VLConfig,
    input_ids,                      # (B, S)
    *,
    pixel_values=None,              # (S_patches, patch_dim) packed over batch
    grid_thw=None,                  # list of (t, h, w) — static python ints
    vision_embeds=None,             # precomputed (N, D) alternative
    position_ids=None,              # (3, B, S)
    kv_mask=None,                   # (B, S) attention mask
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
            params, cfg, pixel_values, grid_thw, remat=remat,
            attn_impl=attn_impl,
        )
    if vision_embeds is not None:
        token_embeds = merge_vision_embeds(
            cfg, input_ids, token_embeds, vision_embeds
        )
    return _lm_forward(
        params["model"], cfg.text,
        input_embeds=token_embeds, position_ids=position_ids,
        kv_mask=kv_mask, cache=cache, cache_index=cache_index,
        logits=logits, remat=remat, attn_impl=attn_impl,
    )


def make_kv_cache(cfg: Qwen25VLConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16):
    return init_kv_cache(cfg.text, batch, max_len, dtype)
