"""Continuous-batching serving engine (the vLLM-role counterpart)."""

from spacer_tpu.serving.batcher import ContinuousBatcher, ServedOutput
from spacer_tpu.serving.ragged import ragged_decode_step
from spacer_tpu.serving.server import OpenAIServer, ServingLoop

__all__ = ["ContinuousBatcher", "ServedOutput", "ragged_decode_step",
           "OpenAIServer", "ServingLoop"]
