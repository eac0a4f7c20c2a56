"""GRPO / SG-RLVR loss math and reward shaping.

Formulas (SG_RLVR_trainer.py):
- k3 KL:     exp(clamp(ref - pol, -10, 10)) - (ref - pol) - 1        (:551-552)
- advantage: (r - mean_G(r)) / (std_G(r) + 1e-4), std unbiased       (:632-638)
- loss:      -mean_seq( sum_t mask * (exp(logp - sg(logp)) * adv
                                       - beta * kl) / sum_t mask )   (:640-643)
- temporal bonus: +0.3 to samples with acc > 0.1 when mean(acc) >=
  0.8 * mean(shuffled acc)                                           (:598-609)
- length bonus: +0.2 for correct (acc > 0.1) completions with
  320 <= len <= 512, only when >1 completion is correct             (:620-629)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def per_token_logps_from_logits(logits, target_ids):
    """log softmax + gather. logits: (B, S, V) for positions predicting
    target_ids (B, S)."""
    logps = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logps, target_ids[..., None], axis=-1)[..., 0]


def chunked_per_token_logps(hidden, head_kernel, target_ids, chunk: int = 256):
    """Memory-bounded per-token logps: scan over sequence chunks so the
    (B, S, V) logits tensor is never materialized — in the forward OR the
    backward: the chunk body is checkpointed, so backward recomputes each
    chunk's logits instead of saving them (the difference between ~1 and
    ~15 GB at (8, 3k, 152k)).

    hidden: (B, S, D) final hidden states aligned so position i predicts
    target_ids[:, i].  head_kernel: (D, V).  The matmul runs in the input
    dtype with f32 accumulation; softmax statistics are f32.
    """
    B, S, D = hidden.shape

    def chunk_logps(h, t):
        logits = jnp.einsum("bsd,dv->bsv", h, head_kernel,
                            preferred_element_type=jnp.float32)
        return per_token_logps_from_logits(logits, t)

    if S <= chunk:
        return chunk_logps(hidden, target_ids)
    pad = (-S) % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        target_ids = jnp.pad(target_ids, ((0, 0), (0, pad)))
    n = (S + pad) // chunk
    chunk_logps = jax.checkpoint(chunk_logps)

    def body(carry, xs):
        h, t = xs  # (B, chunk, D), (B, chunk)
        return carry, chunk_logps(h, t)

    hs = hidden.reshape(B, n, chunk, D).transpose(1, 0, 2, 3)
    ts = target_ids.reshape(B, n, chunk).transpose(1, 0, 2)
    _, out = jax.lax.scan(body, None, (hs, ts))
    return out.transpose(1, 0, 2).reshape(B, S + pad)[:, :S]


def k3_kl(ref_logps, logps):
    x = jnp.clip(ref_logps - logps, -10.0, 10.0)
    return jnp.exp(x) - x - 1.0


def group_advantages(rewards, num_generations: int, eps: float = 1e-4):
    """(B*G,) rewards -> (B*G,) group-normalized advantages.

    std is the unbiased (ddof=1) estimator, matching torch .std(dim=1).
    """
    r = rewards.reshape(-1, num_generations)
    mean = r.mean(axis=1, keepdims=True)
    std = r.std(axis=1, ddof=1, keepdims=True)
    return ((r - mean) / (std + eps)).reshape(-1)


def grpo_loss(per_token_logps, ref_per_token_logps, advantages,
              completion_mask, beta: float = 0.04):
    """Returns (loss, metrics dict). All inputs over completion tokens only.

    per_token_logps: (N, C); ref_per_token_logps: (N, C) [no grad], or
    None when beta == 0 (no-KL training, TRL GRPOConfig beta=0 semantics —
    the reference model is never evaluated);
    advantages: (N,); completion_mask: (N, C) in {0, 1}.
    """
    if ref_per_token_logps is None:
        assert beta == 0.0, "ref logps required when beta != 0"
        per_token_kl = jnp.zeros_like(per_token_logps)
    else:
        per_token_kl = k3_kl(
            jax.lax.stop_gradient(ref_per_token_logps), per_token_logps
        )
    ratio = jnp.exp(per_token_logps - jax.lax.stop_gradient(per_token_logps))
    per_token_loss = ratio * advantages[:, None]
    per_token_loss = -(per_token_loss - beta * per_token_kl)
    mask = completion_mask.astype(per_token_loss.dtype)
    denom = jnp.maximum(mask.sum(axis=1), 1.0)
    loss = ((per_token_loss * mask).sum(axis=1) / denom).mean()
    mean_kl = ((per_token_kl * mask).sum(axis=1) / denom).mean()
    return loss, {"kl": mean_kl}


# ---------------------------------------------------------------------------
# Reward shaping (host-side numpy; runs between reward fns and the train step)
# ---------------------------------------------------------------------------


def temporal_bonus(rewards_per_func: np.ndarray,
                   shuffled_rewards_per_func: np.ndarray,
                   bonus: float = 0.3, threshold: float = 0.8,
                   acc_floor: float = 0.1):
    """SG-RLVR temporal-shuffle consistency bonus.

    rewards_per_func: (N, n_funcs) with accuracy in column 0. Returns
    (adjusted copy, temporal_flag in {0.0, 1.0}).
    """
    out = rewards_per_func.copy()
    acc_mean = out[:, 0].mean()
    shuffled_acc_mean = shuffled_rewards_per_func[:, 0].mean()
    if acc_mean >= threshold * shuffled_acc_mean:
        mask = out[:, 0] > acc_floor
        out[mask, 0] = out[mask, 0] + bonus
        return out, 1.0
    return out, 0.0


def length_control_bonus(rewards: np.ndarray, acc_rewards: np.ndarray,
                         lengths: np.ndarray, bonus: float = 0.2,
                         lo: int = 320, hi: int = 512,
                         acc_floor: float = 0.1) -> np.ndarray:
    """+bonus for correct completions with length in [lo, hi], applied only
    when more than one completion in the batch is correct."""
    out = rewards.copy()
    selected = np.nonzero(acc_rewards > acc_floor)[0]
    if len(selected) > 1:
        for idx in selected:
            if lo <= lengths[idx] <= hi:
                out[idx] += bonus
    return out
