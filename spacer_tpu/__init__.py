"""spacer_tpu — a TPU-native framework for spatially-grounded RLVR on video VLMs.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
OuyangKun10/SpaceR (SG-RLVR training + multi-benchmark video eval), designed
TPU-first: SPMD over a jax.sharding.Mesh, Pallas kernels for the attention /
logprob hot paths, a KV-cached on-mesh sampler instead of vLLM, and FSDP-style
parameter sharding instead of DeepSpeed ZeRO.

Subpackages
-----------
- ``spacer_tpu.vision``   — video/image preprocessing (qwen-vl-utils parity)
- ``spacer_tpu.models``   — Qwen2.5-VL in JAX (windowed ViT + M-RoPE LM)
- ``spacer_tpu.ops``      — Pallas TPU kernels (flash attention, fused logp)
- ``spacer_tpu.parallel`` — mesh construction + parameter partitioning
- ``spacer_tpu.sampler``  — batched KV-cached autoregressive sampler
- ``spacer_tpu.rewards``  — verifiable reward functions (host-side)
- ``spacer_tpu.train``    — GRPO / SG-RLVR / SFT train steps and trainer loop
- ``spacer_tpu.evalharness`` — VSI-Bench & co. evaluation harness
- ``spacer_tpu.data``     — dataset loading and prompt templating
"""

__version__ = "0.1.0"
