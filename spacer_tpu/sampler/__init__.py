"""Batched KV-cached autoregressive sampler (the on-TPU vLLM replacement).

Reference behavior replaced: vllm_grpo_trainer_modified.py:317-391, 524-649
(dedicated-GPU vLLM engine, weight hot-reload, rank0 generate + broadcast).
On TPU none of that machinery exists: the sampler is a jitted decode step
sharing params with the train step on the same mesh; grouped sampling reuses
one prompt prefill for all G completions (the prefix-caching analogue).
"""

from spacer_tpu.sampler.sampler import Sampler, SampleOutput, sample_logits

__all__ = ["Sampler", "SampleOutput", "sample_logits"]
