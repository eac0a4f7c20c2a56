"""Pallas TPU kernels for the hot paths.

- flash_attention: block-wise online-softmax attention (causal / segment /
  padding masking), replacing the reference's flash-attn 2 CUDA dependency
  (SG_RLVR_trainer.py:152).
- fused_logp: fused log-softmax + gather for per-token log-probabilities,
  replacing the reference's per-row python loop (SG_RLVR_trainer.py:353-366).
"""
