"""Jitted SPMD train steps: GRPO (policy + frozen ref) and SFT.

One compiled program does: vision encode (once per group, not xG like the
reference's pixel tiling, SG_RLVR_trainer.py:516-518) -> policy logps over
completion tokens (chunked head, no (N, S, V) materialization) -> ref logps
-> k3 KL + GRPO loss -> optax update.  Rewards/advantages arrive from host.

Sharding: caller places params/opt_state with parallel.shard_params and the
batch with batch_spec; jit compiles the collectives.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl.config import Qwen25VLConfig
from spacer_tpu.models.qwen25_vl.model import (
    encode_vision,
    lm_forward,
    merge_vision_embeds,
)
from spacer_tpu.models.registry import family_for_config
from spacer_tpu.nn.core import embed
from spacer_tpu.train.grpo import chunked_per_token_logps, grpo_loss


def _head_kernel(params_model, text_cfg):
    if text_cfg.tie_word_embeddings:
        return params_model["embed_tokens"]["embedding"].T
    return params_model["lm_head"]["kernel"]


def tile_vision_embeds(ve, cfg: Qwen25VLConfig, grid_thw, num_generations: int,
                       grids_per_prompt=None):
    """Broadcast per-prompt vision embeddings across each prompt's G
    completions, preserving group-major row order [p0*G, p1*G, ...].

    ve: (sum_p n_p, D) merged embeddings for all prompts' media in prompt
    order.  grids_per_prompt: static tuple, number of grids owned by each
    prompt (None or single-prompt -> plain tile, the B=1 fast path).
    """
    if grids_per_prompt is None or len(grids_per_prompt) <= 1:
        return jnp.tile(ve, (num_generations, 1))
    mu = cfg.vision.spatial_merge_unit
    counts = [t * h * w // mu for (t, h, w) in grid_thw]
    parts, off, i = [], 0, 0
    for ng in grids_per_prompt:
        n = sum(counts[i : i + ng])
        i += ng
        parts.append(jnp.tile(ve[off : off + n], (num_generations, 1)))
        off += n
    return jnp.concatenate(parts, axis=0)


def _completion_logps(
    params, cfg, input_ids, position_ids, kv_mask,
    prompt_len: int, vision_embeds=None, remat: bool = False,
    attn_impl=None, logp_chunk: int = 256, merge_fn=merge_vision_embeds,
):
    """Per-token logps of the completion part. input_ids: (N, P+C)."""
    token_embeds = embed(params["model"]["embed_tokens"], input_ids)
    if vision_embeds is not None:
        token_embeds = merge_fn(cfg, input_ids, token_embeds, vision_embeds)
    hidden, _ = lm_forward(
        params["model"], cfg.text, input_embeds=token_embeds,
        position_ids=position_ids, kv_mask=kv_mask, logits=False,
        remat=remat, attn_impl=attn_impl,
    )
    # position i predicts token i+1; completion tokens are ids[:, P:]
    h = hidden[:, prompt_len - 1 : -1]
    targets = input_ids[:, prompt_len:]
    head = _head_kernel(params["model"], cfg.text)
    return chunked_per_token_logps(h, head, targets, chunk=logp_chunk)


def make_grpo_train_step(
    cfg,
    tx,
    *,
    beta: float = 0.04,
    prompt_len: int | None = None,
    remat: bool = True,
    attn_impl: Optional[str] = None,
    logp_chunk: int = 256,
    encode_vision_in_step: bool = True,
):
    """Returns step(params, ref_params, opt_state, batch, grid_thw,
    num_generations, prompt_len) -> (params, opt_state, metrics).

    `prompt_len` is static (one compiled program per length bucket); it may
    be bound here or passed per call.  Family-agnostic: cfg may be a
    Qwen25VLConfig or AriaConfig; vision encode/tile/merge dispatch through
    models.registry.

    batch dict:
      input_ids       (N, P+C) prompt+completion, left-padded prompt
      kv_mask         (N, P+C) attention mask incl. completion mask
      position_ids    (3, N, P+C)
      completion_mask (N, C)
      advantages      (N,)
      vision arrays   family.vision_batch_keys (e.g. pixel_values), optional
      grid_thw        static aux for vision encode (qwen grids; None = aria)
      num_generations int: tile factor for shared vision embeds
    """
    bound_prompt_len = prompt_len
    family = family_for_config(cfg)

    def _vision_embeds(params, batch, grid_thw, num_generations,
                       grids_per_prompt):
        has_vision = any(k in batch for k in family.vision_batch_keys)
        if not (has_vision and encode_vision_in_step):
            return None
        vk = {k: batch[k] for k in family.vision_batch_keys if k in batch}
        ve = family.encode_vision(params, cfg, vk, grid_thw,
                                  remat=remat, attn_impl=attn_impl)
        return family.tile_vision_embeds(
            ve, cfg, grid_thw, num_generations, grids_per_prompt
        )

    def loss_fn(params, ref_logps, batch, grid_thw, num_generations,
                prompt_len, grids_per_prompt):
        vision_embeds = _vision_embeds(
            params, batch, grid_thw, num_generations, grids_per_prompt
        )
        logps = _completion_logps(
            params, cfg, batch["input_ids"], batch["position_ids"],
            batch["kv_mask"], prompt_len, vision_embeds=vision_embeds,
            remat=remat, attn_impl=attn_impl, logp_chunk=logp_chunk,
            merge_fn=family.merge_vision_embeds,
        )
        loss, metrics = grpo_loss(
            logps, ref_logps, batch["advantages"], batch["completion_mask"],
            beta=beta,
        )
        return loss, metrics

    @functools.partial(
        jax.jit,
        static_argnames=("grid_thw", "num_generations", "prompt_len",
                         "grids_per_prompt"),
    )
    def ref_logps_fn(ref_params, batch, grid_thw=None,
                     num_generations: int = 1,
                     prompt_len: int | None = None,
                     grids_per_prompt=None):
        """Reference logps as a standalone jit: the trainer dispatches this
        asynchronously right after rollout so it overlaps with host-side
        reward computation."""
        prompt_len = prompt_len if prompt_len is not None else bound_prompt_len
        ref_vision_embeds = _vision_embeds(
            ref_params, batch, grid_thw, num_generations, grids_per_prompt
        )
        return _completion_logps(
            ref_params, cfg, batch["input_ids"], batch["position_ids"],
            batch["kv_mask"], prompt_len, vision_embeds=ref_vision_embeds,
            remat=remat, attn_impl=attn_impl, logp_chunk=logp_chunk,
            merge_fn=family.merge_vision_embeds,
        )

    @functools.partial(
        jax.jit,
        static_argnames=("grid_thw", "num_generations", "prompt_len",
                         "grids_per_prompt"),
        donate_argnames=("params", "opt_state"),
    )
    def step(params, ref_params, opt_state, batch, grid_thw=None,
             num_generations: int = 1, prompt_len: int | None = None,
             grids_per_prompt=None):
        prompt_len = prompt_len if prompt_len is not None else bound_prompt_len
        if "ref_logps" in batch:
            ref_logps = batch["ref_logps"]
        else:
            ref_logps = ref_logps_fn(
                ref_params, batch, grid_thw, num_generations, prompt_len,
                grids_per_prompt,
            )
        ref_logps = jax.lax.stop_gradient(ref_logps)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, ref_logps,
            {k: v for k, v in batch.items() if k != "ref_logps"},
            grid_thw, num_generations, prompt_len, grids_per_prompt
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda p, u: (p + u.astype(p.dtype)), params, updates
        )
        gnorm = optax_global_norm(grads)
        metrics = dict(metrics, loss=loss, grad_norm=gnorm)
        return params, opt_state, metrics

    def step_callable(*args, **kwargs):
        return step(*args, **kwargs)

    step_callable.ref_logps_fn = ref_logps_fn
    return step_callable


def optax_global_norm(tree):
    import optax

    return optax.global_norm(tree)


def make_sft_train_step(
    cfg: Qwen25VLConfig,
    tx,
    *,
    remat: bool = True,
    attn_impl: Optional[str] = None,
    logp_chunk: int = 256,
):
    """SFT step (sft.py semantics): next-token CE with labels = input_ids,
    positions with label -100 (pad + visual tokens) masked out.

    batch: input_ids (N, S), labels (N, S) with -100 masking, kv_mask,
    position_ids (3, N, S), pixel_values/grid_thw optional.
    """

    def loss_fn(params, batch, grid_thw):
        vision_embeds = None
        if grid_thw is not None:
            vision_embeds = encode_vision(
                params, cfg, batch["pixel_values"], grid_thw, remat=remat,
                attn_impl=attn_impl,
            )
        token_embeds = embed(params["model"]["embed_tokens"],
                             batch["input_ids"])
        if vision_embeds is not None:
            token_embeds = merge_vision_embeds(
                cfg, batch["input_ids"], token_embeds, vision_embeds
            )
        hidden, _ = lm_forward(
            params["model"], cfg.text, input_embeds=token_embeds,
            position_ids=batch["position_ids"], kv_mask=batch["kv_mask"],
            logits=False, remat=remat, attn_impl=attn_impl,
        )
        h = hidden[:, :-1]
        labels = batch["labels"][:, 1:]
        mask = labels != -100
        safe_labels = jnp.where(mask, labels, 0)
        head = _head_kernel(params["model"], cfg.text).astype(jnp.float32)
        logps = chunked_per_token_logps(
            h.astype(jnp.float32), head, safe_labels, chunk=logp_chunk
        )
        denom = jnp.maximum(mask.sum(), 1)
        loss = -(logps * mask).sum() / denom
        return loss, {"n_tokens": denom}

    @functools.partial(
        jax.jit, static_argnames=("grid_thw",),
        donate_argnames=("params", "opt_state"),
    )
    def step(params, opt_state, batch, grid_thw=None):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, grid_thw
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u.astype(p.dtype), params, updates)
        metrics = dict(metrics, loss=loss, grad_norm=optax_global_norm(grads))
        return params, opt_state, metrics

    return step
