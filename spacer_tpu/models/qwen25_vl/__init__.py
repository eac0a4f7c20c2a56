"""Qwen2.5-VL in JAX: windowed-attention ViT + M-RoPE language model."""

from spacer_tpu.models.qwen25_vl.config import (
    Qwen25VLConfig,
    VisionConfig,
    TextConfig,
    QWEN25_VL_7B,
    QWEN25_VL_3B,
    QWEN2_VL_7B,
    tiny_config,
)
from spacer_tpu.models.qwen25_vl.model import (
    init_params,
    forward,
    encode_vision,
    lm_forward,
)
from spacer_tpu.models.qwen25_vl.rope_index import get_rope_index
from spacer_tpu.models.qwen25_vl.loading import (
    load_params_from_hf,
    params_from_torch_state_dict,
)

__all__ = [
    "Qwen25VLConfig", "VisionConfig", "TextConfig",
    "QWEN25_VL_7B", "QWEN25_VL_3B", "QWEN2_VL_7B", "tiny_config",
    "init_params", "forward", "encode_vision", "lm_forward",
    "get_rope_index", "load_params_from_hf", "params_from_torch_state_dict",
]
