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
from spacer_tpu.models.qwen25_vl.language import init_kv_cache
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
    pipeline=None,
):
    """Per-token logps of the completion part. input_ids: (N, P+C).

    pipeline=(mesh, num_microbatches): run the decoder stack GPipe-
    pipelined over the mesh's `pipe` axis (parallel/pipeline.py) instead
    of the single-program lm_forward — the pp analogue of the ring/sp
    attn_impl tuple, sharing this packed schema."""
    token_embeds = embed(params["model"]["embed_tokens"], input_ids)
    if vision_embeds is not None:
        token_embeds = merge_fn(cfg, input_ids, token_embeds, vision_embeds)
    if pipeline is not None:
        from spacer_tpu.parallel.pipeline import pipeline_lm_forward

        pp_mesh, n_micro = pipeline
        hidden = pipeline_lm_forward(
            params["model"], cfg.text, pp_mesh, num_microbatches=n_micro,
            input_embeds=token_embeds, position_ids=position_ids,
            kv_mask=kv_mask, remat=remat, logits=False,
            batch_axis="data" if "data" in pp_mesh.axis_names else None,
        )
    else:
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


def _completion_logps_shared(
    params, cfg, prompt_ids, prompt_position_ids, prompt_mask,
    completion_ids, completion_position_ids, completion_mask,
    num_generations: int, vision_embeds=None, remat: bool = False,
    attn_impl=None, logp_chunk: int = 256, merge_fn=merge_vision_embeds,
):
    """Shared-prefix per-token completion logps.

    The G completions of a group share an IDENTICAL prompt, so the prompt
    forward (the dominant token count at reference shapes: P=16384 cap vs
    C=1024, run_SpaceR_SG_RLVR.sh:19-20) runs ONCE per group over B rows
    and its per-layer KV is reused by all G completion rows — the training-
    forward analogue of the rollout sampler's prefix sharing (the reference
    instead recomputes the full prompt forward per completion row,
    SG_RLVR_trainer.py:526-532, tiling pixels xG at :516-518).  Per-sample
    flops drop from ~8*N*(P+C) to ~8*N*(P/G + C); gradients flow into the
    prompt pass through the reused KV (a jnp.repeat, whose VJP sums the G
    completion rows' contributions), so the math — logps AND grads — is
    identical to the full forward up to fp reassociation (pinned by
    tests/test_train_step.py parity).

    prompt_ids (B, P) left-padded; completion_ids (B*G, C) group-major.
    completion_mask doubles as the completion part of the attention mask
    (reference concatenates it onto the prompt mask, :493-521).
    """
    B, P = prompt_ids.shape
    N, C = completion_ids.shape
    G = num_generations
    tc = cfg.text

    prompt_embeds = embed(params["model"]["embed_tokens"], prompt_ids)
    if vision_embeds is not None:
        prompt_embeds = merge_fn(cfg, prompt_ids, prompt_embeds,
                                 vision_embeds)
    prompt_cache = init_kv_cache(tc, B, P, dtype=prompt_embeds.dtype)
    hp, prompt_cache = lm_forward(
        params["model"], tc, input_embeds=prompt_embeds,
        position_ids=prompt_position_ids,
        kv_mask=prompt_mask.astype(bool), cache=prompt_cache,
        cache_index=0, logits=False, remat=remat, attn_impl=attn_impl,
    )

    # prompt KV -> per-completion-row cache with room for the C completion
    # keys (the completion forward writes them at cache_index=P)
    def expand(c):  # (L, B, P, Hkv, Dh) -> (L, B*G, P+C, Hkv, Dh)
        c = jnp.repeat(c, G, axis=1)
        pad = [(0, 0)] * c.ndim
        pad[2] = (0, C)
        return jnp.pad(c, pad)

    full_cache = {"k": expand(prompt_cache["k"]),
                  "v": expand(prompt_cache["v"])}
    kv_mask = jnp.concatenate(
        [jnp.repeat(prompt_mask.astype(bool), G, axis=0),
         completion_mask.astype(bool)], axis=1)

    comp_embeds = embed(params["model"]["embed_tokens"], completion_ids)
    hc, _ = lm_forward(
        params["model"], tc, input_embeds=comp_embeds,
        position_ids=completion_position_ids, kv_mask=kv_mask,
        cache=full_cache, cache_index=P, logits=False, remat=remat,
        attn_impl=attn_impl,
    )
    # position P-1 (shared across the group) predicts completion token 0;
    # completion position i predicts token i+1
    h = jnp.concatenate(
        [jnp.repeat(hp[:, -1:], G, axis=0), hc[:, :-1]], axis=1)
    head = _head_kernel(params["model"], cfg.text)
    return chunked_per_token_logps(h, head, completion_ids,
                                   chunk=logp_chunk)


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
    pipeline=None,
):
    """Returns step(params, ref_params, opt_state, batch, grid_thw,
    num_generations, prompt_len) -> (params, opt_state, metrics).

    `prompt_len` is static (one compiled program per length bucket); it may
    be bound here or passed per call.  Family-agnostic: cfg may be a
    Qwen25VLConfig or AriaConfig; vision encode/tile/merge dispatch through
    models.registry.

    Two batch schemas, dispatched on key presence:

    Shared-prefix (default trainer path — prompt forward once per group,
    see _completion_logps_shared):
      prompt_ids              (B, P) left-padded
      prompt_mask             (B, P)
      prompt_position_ids     (3, B, P)
      completion_ids          (B*G, C) group-major [p0*G, p1*G, ...]
      completion_position_ids (3, B*G, C)
      completion_mask         (N, C) — loss mask AND completion attn mask
      advantages              (N,)
      vision arrays           family.vision_batch_keys, optional

    Legacy packed (numerics oracle; also the ring-attention/sp path and,
    via pipeline=(mesh, num_microbatches), the pipeline-parallel path):
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

    def _logps(params, batch, grid_thw, num_generations, prompt_len,
               grids_per_prompt):
        """Dispatch on batch schema: shared-prefix (prompt/completion split,
        the default trainer path) vs legacy packed (N, P+C) rows."""
        if "prompt_ids" in batch:
            assert pipeline is None, (
                "pipeline parallelism uses the packed (input_ids/kv_mask) "
                "schema, like the ring/sp path"
            )
            vk = {k: batch[k] for k in family.vision_batch_keys if k in batch}
            vision_embeds = None
            if vk and encode_vision_in_step:
                # merged into the B prompt rows — no xG tiling at all
                vision_embeds = family.encode_vision(
                    params, cfg, vk, grid_thw, remat=remat,
                    attn_impl=attn_impl)
            return _completion_logps_shared(
                params, cfg, batch["prompt_ids"],
                batch["prompt_position_ids"], batch["prompt_mask"],
                batch["completion_ids"], batch["completion_position_ids"],
                batch["completion_mask"], num_generations,
                vision_embeds=vision_embeds, remat=remat,
                attn_impl=attn_impl, logp_chunk=logp_chunk,
                merge_fn=family.merge_vision_embeds,
            )
        vision_embeds = _vision_embeds(
            params, batch, grid_thw, num_generations, grids_per_prompt
        )
        return _completion_logps(
            params, cfg, batch["input_ids"], batch["position_ids"],
            batch["kv_mask"], prompt_len, vision_embeds=vision_embeds,
            remat=remat, attn_impl=attn_impl, logp_chunk=logp_chunk,
            merge_fn=family.merge_vision_embeds, pipeline=pipeline,
        )

    def loss_fn(params, ref_logps, batch, grid_thw, num_generations,
                prompt_len, grids_per_prompt):
        logps = _logps(params, batch, grid_thw, num_generations, prompt_len,
                       grids_per_prompt)
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
        reward computation.  At beta == 0 the KL term vanishes, so the
        reference forward is skipped entirely (TRL GRPOConfig beta=0
        semantics: no ref model)."""
        if beta == 0.0:
            return None
        prompt_len = prompt_len if prompt_len is not None else bound_prompt_len
        return _logps(ref_params, batch, grid_thw, num_generations,
                      prompt_len, grids_per_prompt)

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
        if beta == 0.0:
            ref_logps = None  # KL-free: the ref forward never runs
        elif "ref_logps" in batch:
            ref_logps = jax.lax.stop_gradient(batch["ref_logps"])
        else:
            ref_logps = jax.lax.stop_gradient(ref_logps_fn(
                ref_params, batch, grid_thw, num_generations, prompt_len,
                grids_per_prompt,
            ))

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

    @functools.partial(
        jax.jit,
        static_argnames=("grid_thw", "num_generations", "prompt_len",
                         "grids_per_prompt", "accum_dtype"),
        donate_argnames=("params", "opt_state"),
    )
    def step_accum(params, ref_params, opt_state, batch, grid_thw=None,
                   num_generations: int = 1, prompt_len: int | None = None,
                   grids_per_prompt=None, accum_dtype=jnp.float32):
        """Gradient-accumulated single-program step: every `batch` leaf
        carries a leading n_accum axis of uniform-shape chunks (each chunk
        = one `step` batch); a lax.scan accumulates the chunk gradients and
        ONE optimizer apply consumes their mean.

        This is the reference's global-batch semantics — HF Trainer takes
        one AdamW step per world_size x grad_accum prompts
        (run_SpaceR_SG_RLVR.sh:9,21) — where the sequential per-chunk
        `step` loop takes n_accum optimizer steps.  It is also the
        single-chip memory fallback that replaces n_accum program
        dispatches (~40ms relay RTT each) with one.
        """
        prompt_len = (prompt_len if prompt_len is not None
                      else bound_prompt_len)
        n_accum = jax.tree_util.tree_leaves(batch)[0].shape[0]

        def body(gacc, chunk):
            if beta == 0.0:
                ref_logps = None
            elif "ref_logps" in chunk:
                ref_logps = jax.lax.stop_gradient(chunk["ref_logps"])
            else:
                ref_logps = jax.lax.stop_gradient(_logps(
                    ref_params, chunk, grid_thw, num_generations,
                    prompt_len, grids_per_prompt,
                ))
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(
                params, ref_logps,
                {k: v for k, v in chunk.items() if k != "ref_logps"},
                grid_thw, num_generations, prompt_len, grids_per_prompt,
            )
            gacc = jax.tree.map(
                lambda a, g: a + g.astype(a.dtype), gacc, grads
            )
            return gacc, dict(metrics, loss=loss)

        # accumulator dtype: f32 is the exact mean-of-chunks; bf16 halves
        # the params-sized carry (single-chip HBM — the scan may double-
        # buffer it) at ~0.4% grad rounding, same trade grad_chunk declares
        gacc0 = jax.tree.map(
            lambda p: jnp.zeros(p.shape, accum_dtype), params
        )
        gacc, ms = jax.lax.scan(body, gacc0, batch)
        grads = jax.tree.map(lambda g: (g / n_accum).astype(g.dtype), gacc)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda p, u: (p + u.astype(p.dtype)), params, updates
        )
        metrics = {k: v.mean() for k, v in ms.items()}
        metrics["grad_norm"] = optax_global_norm(grads)
        return params, opt_state, metrics

    # Chunked accumulation, host-driven: the single-chip alternative to
    # step_accum when the scan carry cannot afford XLA's double buffering
    # (an f32 accumulator is params x4 bytes; the scan may copy it).  The
    # accumulator is DONATED through each chunk program, so its buffer is
    # reused in place across the loop; one apply program finishes the step.
    @functools.partial(
        jax.jit,
        static_argnames=("grid_thw", "num_generations", "prompt_len",
                         "grids_per_prompt"),
        donate_argnames=("gacc",),
    )
    def grad_chunk(params, ref_params, gacc, batch, grid_thw=None,
                   num_generations: int = 1, prompt_len: int | None = None,
                   grids_per_prompt=None):
        prompt_len = (prompt_len if prompt_len is not None
                      else bound_prompt_len)
        if beta == 0.0:
            ref_logps = None
        elif "ref_logps" in batch:
            ref_logps = jax.lax.stop_gradient(batch["ref_logps"])
        else:
            ref_logps = jax.lax.stop_gradient(ref_logps_fn(
                ref_params, batch, grid_thw, num_generations, prompt_len,
                grids_per_prompt,
            ))
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, ref_logps,
            {k: v for k, v in batch.items() if k != "ref_logps"},
            grid_thw, num_generations, prompt_len, grids_per_prompt,
        )
        gacc = jax.tree.map(lambda a, g: a + g.astype(a.dtype), gacc, grads)
        return gacc, dict(metrics, loss=loss)

    @functools.partial(jax.jit, static_argnames=("n_accum",),
                       donate_argnames=("params", "opt_state", "gacc"))
    def apply_grads(params, opt_state, gacc, n_accum: int):
        """One optimizer apply over the accumulated mean gradient; returns
        a zeroed accumulator reusing the donated buffers for the next
        step's chunk loop."""
        # divide in the accumulator's own dtype: exact for power-of-two
        # n_accum (exponent shift), and a bf16 accumulator must not inflate
        # into a params-sized f32 temp tree here (single-chip HBM)
        grads = jax.tree.map(
            lambda g: (g / n_accum).astype(g.dtype), gacc)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda p, u: (p + u.astype(p.dtype)), params, updates
        )
        fresh = jax.tree.map(jnp.zeros_like, gacc)
        return params, opt_state, optax_global_norm(grads), fresh

    def init_gacc(params, dtype=jnp.float32):
        # one-time eager allocation; steady-state reuse comes from
        # apply_grads' zeroed return
        return jax.tree.map(lambda p: jnp.zeros(p.shape, dtype), params)

    def step_callable(*args, **kwargs):
        return step(*args, **kwargs)

    step_callable.ref_logps_fn = ref_logps_fn
    step_callable.step_accum = step_accum
    step_callable.grad_chunk = grad_chunk
    step_callable.apply_grads = apply_grads
    step_callable.init_gacc = init_gacc
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
    pipeline=None,
):
    """SFT step (sft.py semantics): next-token CE with labels = input_ids,
    positions with label -100 (pad + visual tokens) masked out.

    batch: input_ids (N, S), labels (N, S) with -100 masking, kv_mask,
    position_ids (3, N, S), pixel_values/grid_thw optional.

    pipeline=(mesh, num_microbatches): GPipe-pipelined decoder forward
    (parallel/pipeline.py), same contract as make_grpo_train_step.
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
        if pipeline is not None:
            from spacer_tpu.parallel.pipeline import pipeline_lm_forward

            pp_mesh, n_micro = pipeline
            hidden = pipeline_lm_forward(
                params["model"], cfg.text, pp_mesh,
                num_microbatches=n_micro, input_embeds=token_embeds,
                position_ids=batch["position_ids"],
                kv_mask=batch["kv_mask"], remat=remat, logits=False,
                batch_axis=("data" if "data" in pp_mesh.axis_names
                            else None),
            )
        else:
            hidden, _ = lm_forward(
                params["model"], cfg.text, input_embeds=token_embeds,
                position_ids=batch["position_ids"],
                kv_mask=batch["kv_mask"],
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
