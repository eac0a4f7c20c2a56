"""Optimizer: AdamW + cosine schedule + global-norm clipping.

Reference hyperparameters (run_SpaceR_SG_RLVR.sh:23-25, 37 and HF Trainer
defaults): lr 1e-6, cosine decay to 0 with linear warmup, weight decay 0.01,
max_grad_norm 5, adam betas (0.9, 0.999) eps 1e-8.
"""

from __future__ import annotations

import optax


def make_optimizer(
    learning_rate: float = 1e-6,
    total_steps: int = 10000,
    warmup_steps: int = 0,
    weight_decay: float = 0.01,
    max_grad_norm: float = 5.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    schedule: str = "cosine",
):
    if schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup_steps else learning_rate,
            peak_value=learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=0.0,
        )
    elif schedule == "constant":
        sched = learning_rate
    else:
        raise ValueError(schedule)

    # HF AdamW does not decay layernorm weights / biases; match by masking
    # one-dimensional params out of the weight-decay term.
    def decay_mask(params):
        import jax

        return jax.tree.map(lambda p: p.ndim > 1, params)

    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(
            sched, b1=b1, b2=b2, eps=eps,
            weight_decay=weight_decay, mask=decay_mask,
        ),
    )
