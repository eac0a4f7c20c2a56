"""Model-family registry: one adapter object per supported family.

The reference dispatches on substrings of the HF model id
(grpo_trainer.py:196-205 — "Qwen2-VL" / "Qwen2.5-VL" / "Aria"); here the
same rule returns a ModelFamily bundling the family-specific seams
(config/load/processor/positions/vision-encode) so the sampler, trainer,
and CLI stay family-agnostic.  The compute engine underneath is shared
(models/qwen25_vl/language.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ModelFamily:
    name: str
    config_cls: Any
    tiny_config: Callable[..., Any]
    init_params: Callable[..., Any]
    load_params_from_hf: Callable[..., Any]
    make_processor: Callable[..., Any]          # (tokenizer, cfg) -> processor
    partition_rules: Any
    # (cfg, input_ids, attention_mask, enc) -> (position_ids (3,B,S), deltas (B,1))
    positions: Callable[..., Any]
    # (enc) -> (vision_kwargs dict for encode_vision, static_aux) or (None, None)
    pack_vision: Callable[..., Any]
    # (params, cfg, vision_kwargs, static_aux, **kw) -> (N, D) embeddings
    encode_vision: Callable[..., Any]
    merge_vision_embeds: Callable[..., Any]
    # (ve, cfg, static_aux, num_generations, media_per_prompt) -> tiled ve
    tile_vision_embeds: Callable[..., Any]
    # batch keys that carry vision arrays into the jitted train step
    vision_batch_keys: tuple = ("pixel_values",)


def _qwen_positions(cfg, input_ids, attention_mask, enc):
    from spacer_tpu.models.qwen25_vl.rope_index import get_rope_index

    return get_rope_index(
        cfg,
        input_ids,
        image_grid_thw=enc.get("image_grid_thw"),
        video_grid_thw=enc.get("video_grid_thw"),
        second_per_grid_ts=enc.get("second_per_grid_ts"),
        attention_mask=attention_mask,
    )


def _qwen_pack_vision(enc):
    from spacer_tpu.data.processor import pack_vision_inputs

    px, grids = pack_vision_inputs(enc)
    if px is None:
        return None, None
    return {"pixel_values": px}, grids


def _qwen_encode_vision(params, cfg, vision_kwargs, static_aux, **kw):
    from spacer_tpu.models.qwen25_vl.model import encode_vision

    return encode_vision(
        params, cfg, jnp.asarray(vision_kwargs["pixel_values"]), static_aux,
        **kw,
    )


def aria_positions(cfg, input_ids, attention_mask, enc=None):
    """Plain 1D positions from the attention mask (left padding aware),
    broadcast to the (3, B, S) M-RoPE layout with equal rows.

    deltas: first generated token sits at position n_real_tokens, i.e.
    delta = max_position + 1 - seq_len (same contract as qwen
    get_rope_index, modeling_qwen2_5_vl.py:1030-1034)."""
    mask = np.asarray(attention_mask)
    pos = np.clip(np.cumsum(mask, axis=1) - 1, 0, None).astype(np.int32)
    B, S = pos.shape
    deltas = (pos.max(axis=1, keepdims=True) + 1 - S).astype(np.int32)
    pos3 = np.broadcast_to(pos[None], (3, B, S)).copy()
    return pos3, deltas


def _aria_pack_vision(enc):
    if "pixel_values" not in enc:
        return None, None
    return {
        "pixel_values": enc["pixel_values"],
        "position_ids": enc["pixel_position_ids"],
        "patch_mask": enc["patch_mask"],
    }, None


def _aria_encode_vision(params, cfg, vision_kwargs, static_aux, **kw):
    from spacer_tpu.models.aria.model import encode_vision

    kw.pop("attn_impl", None)  # tower dispatches internally
    pos = vision_kwargs.get("position_ids")
    if pos is None:
        pos = vision_kwargs["pixel_position_ids"]
    return encode_vision(
        params, cfg, jnp.asarray(vision_kwargs["pixel_values"]),
        jnp.asarray(pos),
        patch_mask=jnp.asarray(vision_kwargs["patch_mask"]), **kw,
    )


def _aria_tile_vision_embeds(ve, cfg, static_aux, num_generations,
                             media_per_prompt=None):
    """Broadcast per-prompt projector embeddings across G completions.

    ve: (total_crops * Q, D); every crop contributes the same static Q
    queries, so per-prompt counts are crops_p * Q."""
    if media_per_prompt is None or len(media_per_prompt) <= 1:
        return jnp.tile(ve, (num_generations, 1))
    total_crops = sum(media_per_prompt)
    q = ve.shape[0] // total_crops
    parts, off = [], 0
    for n_crops in media_per_prompt:
        n = n_crops * q
        parts.append(jnp.tile(ve[off: off + n], (num_generations, 1)))
        off += n
    return jnp.concatenate(parts, axis=0)


def _make_qwen_family():
    from spacer_tpu.data.processor import VLProcessor
    from spacer_tpu.models.qwen25_vl import (
        Qwen25VLConfig, init_params, load_params_from_hf, tiny_config,
    )
    from spacer_tpu.models.qwen25_vl.model import merge_vision_embeds

    def _tile(ve, cfg, static_aux, num_generations, media_per_prompt=None):
        from spacer_tpu.train.step import tile_vision_embeds

        return tile_vision_embeds(ve, cfg, static_aux, num_generations,
                                  media_per_prompt)

    from spacer_tpu.parallel import QWEN_PARTITION_RULES

    return ModelFamily(
        name="qwen25_vl",
        config_cls=Qwen25VLConfig,
        tiny_config=tiny_config,
        init_params=init_params,
        load_params_from_hf=load_params_from_hf,
        make_processor=lambda tok, cfg: VLProcessor(tok, cfg),
        partition_rules=QWEN_PARTITION_RULES,
        positions=_qwen_positions,
        pack_vision=_qwen_pack_vision,
        encode_vision=_qwen_encode_vision,
        merge_vision_embeds=merge_vision_embeds,
        tile_vision_embeds=_tile,
        vision_batch_keys=("pixel_values",),
    )


def _make_aria_family():
    from spacer_tpu.data.aria_processor import AriaProcessor
    from spacer_tpu.models.aria import (
        AriaConfig, init_params, load_params_from_hf, tiny_aria_config,
    )
    from spacer_tpu.models.aria.model import merge_vision_embeds
    from spacer_tpu.parallel import ARIA_PARTITION_RULES

    return ModelFamily(
        name="aria",
        config_cls=AriaConfig,
        tiny_config=tiny_aria_config,
        init_params=init_params,
        load_params_from_hf=load_params_from_hf,
        make_processor=lambda tok, cfg: AriaProcessor(tok, cfg),
        partition_rules=ARIA_PARTITION_RULES,
        positions=aria_positions,
        pack_vision=_aria_pack_vision,
        encode_vision=_aria_encode_vision,
        merge_vision_embeds=merge_vision_embeds,
        tile_vision_embeds=_aria_tile_vision_embeds,
        vision_batch_keys=("pixel_values", "pixel_position_ids",
                           "patch_mask"),
    )


_FACTORIES = {
    "qwen25_vl": _make_qwen_family,
    "aria": _make_aria_family,
}
_CACHE: dict[str, ModelFamily] = {}


def get_family(name_or_model_id: str) -> ModelFamily:
    """Resolve a family by name or by HF model-id substring (the reference
    trainer's dispatch rule, grpo_trainer.py:196-205)."""
    key = name_or_model_id.lower()
    if key in _FACTORIES:
        name = key
    elif "aria" in key:
        name = "aria"
    else:
        # Qwen2-VL / Qwen2.5-VL / default fall through to the Qwen family
        # (the reference's else-branch also defaults to Qwen2.5-VL)
        name = "qwen25_vl"
    if name not in _CACHE:
        _CACHE[name] = _FACTORIES[name]()
    return _CACHE[name]


def family_for_config(cfg) -> ModelFamily:
    """Resolve from a config object (AriaConfig vs Qwen25VLConfig)."""
    return get_family(type(cfg).__name__)


def encode_request(processor, cfg, conversation: list) -> dict:
    """One conversation (processor message schema) -> a serving request
    dict (input_ids/attention_mask/position_ids/deltas/grid_thw[/vision
    kwargs]) for ContinuousBatcher — the single encode path shared by
    QwenEngine.generate_many and the HTTP server (serving/server.py)."""
    from spacer_tpu.data.processor import pack_vision_inputs

    enc = processor.process_messages([conversation],
                                     add_generation_prompt=True)
    family = family_for_config(cfg)
    pos, deltas = family.positions(
        cfg, enc["input_ids"], enc["attention_mask"], enc)
    pixel_values, grid_thw = pack_vision_inputs(enc)
    req = {
        "input_ids": enc["input_ids"],
        "attention_mask": enc["attention_mask"],
        "position_ids": pos,
        "deltas": deltas,
        "grid_thw": grid_thw,
    }
    if pixel_values is not None:
        req["vision_kwargs"] = {"pixel_values": pixel_values}
    return req
