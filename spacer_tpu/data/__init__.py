"""Data layer: chat templating, multimodal processing, dataset loading.

Replaces the reference's AutoProcessor + TRL maybe_apply_chat_template +
datasets pipeline (SG-RLVR.py:260-357, SG_RLVR_trainer.py:390-440).
"""

from spacer_tpu.data.processor import (
    VLProcessor,
    MockTokenizer,
    render_chat_template,
)
from spacer_tpu.data.templates import (
    SYSTEM_PROMPT,
    QUESTION_TEMPLATE,
    COGMAP_TEMPLATE,
    TYPE_TEMPLATE,
    EXAMPLE_MAP,
    make_conversation,
)
from spacer_tpu.data.dataset import load_jsonl_dataset, load_cognitive_maps, read_data

__all__ = [
    "VLProcessor", "MockTokenizer", "render_chat_template",
    "SYSTEM_PROMPT", "QUESTION_TEMPLATE", "COGMAP_TEMPLATE", "TYPE_TEMPLATE",
    "EXAMPLE_MAP", "make_conversation",
    "load_jsonl_dataset", "load_cognitive_maps", "read_data",
]
