"""Pallas TPU kernels for the hot paths.

- flash_attention: block-wise online-softmax attention (causal / segment /
  padding masking, GQA) with a custom-VJP backward, replacing the
  reference's flash-attn 2 CUDA dependency (SG_RLVR_trainer.py:152).

The other kernel-class hot spot — per-token log-probabilities (the
reference's per-row python loop, SG_RLVR_trainer.py:353-366, and its liger
fused-CE dependency) — is implemented as a checkpointed chunk scan in
spacer_tpu.train.grpo.chunked_per_token_logps: XLA fuses the per-chunk
matmul+log-softmax+gather, and the chunk size bounds logits memory in both
passes; at training shapes it is <1% of step time, so a hand-written kernel
buys nothing there.
"""
