"""Aria MoE vision-language model family (reference grpo_trainer.py Aria
branch, :200-202/:224-225; HF rhymes-ai/Aria)."""

from spacer_tpu.models.aria.config import (
    ARIA_25B,
    AriaConfig,
    AriaTextConfig,
    AriaVisionConfig,
    tiny_aria_config,
)
from spacer_tpu.models.aria.language import (
    init_kv_cache,
    init_lm_params,
    positions_1d_to_3d,
)
from spacer_tpu.models.aria.loading import (
    load_params_from_hf,
    params_from_torch_state_dict,
)
from spacer_tpu.models.aria.model import (
    encode_vision,
    forward,
    init_params,
    lm_forward,
    make_kv_cache,
    merge_vision_embeds,
)
from spacer_tpu.models.aria.vision import (
    projector_forward,
    vision_position_ids,
    vit_forward,
)

__all__ = [
    "ARIA_25B",
    "AriaConfig",
    "AriaTextConfig",
    "AriaVisionConfig",
    "tiny_aria_config",
    "init_kv_cache",
    "init_lm_params",
    "positions_1d_to_3d",
    "load_params_from_hf",
    "params_from_torch_state_dict",
    "encode_vision",
    "forward",
    "init_params",
    "lm_forward",
    "make_kv_cache",
    "merge_vision_embeds",
    "projector_forward",
    "vision_position_ids",
    "vit_forward",
]
