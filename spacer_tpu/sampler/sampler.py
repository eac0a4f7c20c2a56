"""KV-cached autoregressive sampling under jit.

Design (TPU-first):
- prefill once per prompt (B rows), then tile the KV cache G-fold so the
  G completions of a group share the prompt prefix compute — the reference
  gets this from vLLM's enable_prefix_caching
  (vllm_grpo_trainer_modified.py:365-367); here it is a jnp.repeat.
- decode loop is a lax.while_loop inside one jit: static shapes, early exit
  when every row has emitted EOS.
- top-p is exact (full-vocab sort per step); temperature 0 or None means
  greedy argmax.

Completion semantics match the reference trainer: tokens after the first EOS
are garbage and must be masked by the caller with `completion_mask`
(SG_RLVR_trainer.py:493-498); `SampleOutput.completion_mask` implements that
rule (mask includes the EOS token itself).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spacer_tpu.models.qwen25_vl.config import Qwen25VLConfig
from spacer_tpu.models.qwen25_vl.language import init_kv_cache, lm_forward
from spacer_tpu.models.qwen25_vl.model import encode_vision, forward
from spacer_tpu.nn.core import embed as embed_op


@dataclasses.dataclass
class SampleOutput:
    sequences: np.ndarray        # (B*G, max_new) sampled token ids
    completion_mask: np.ndarray  # (B*G, max_new) 1 up to & including first EOS
    lengths: np.ndarray          # (B*G,) completion lengths (mask sums)
    stats: Optional[dict] = None  # telemetry (speculative decode acceptance)


def _topp_threshold_bisect(logits, lse, top_p, iters: int = 24):
    """Per-row nucleus threshold by bisection: the largest t such that
    P(logit >= t) >= top_p.

    Equivalent to the sorted-prefix rule (up to ties at the boundary logit,
    where ALL tied tokens are kept), but with a FIXED cost of `iters`
    masked-sum passes — no vocab sort, no top_k (both are slow on TPU at
    150k vocab: top_k lowers to an iterative partial sort; a full sort of
    (32, 49k) costs ~2.4 ms per decode step).

    The masked sums read BF16 copies of logits/probs (f32 accumulation):
    the bisection is decode-bandwidth on the hot path (iters full-vocab
    passes per step), and bf16 granularity only fuzzes the nucleus
    boundary by ~1e-3 of mass — far below sampling noise.  The returned
    threshold is compared against the same bf16 logits (sample_logits) so
    mass accounting and the final filter agree exactly.
    """
    probs_b = jnp.exp(logits - lse).astype(jnp.bfloat16)
    logits_b = logits.astype(jnp.bfloat16)
    lo = jnp.min(logits, axis=-1, keepdims=True)
    hi = jnp.max(logits, axis=-1, keepdims=True)

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) * 0.5
        mass = jnp.sum(
            jnp.where(logits_b >= mid.astype(jnp.bfloat16), probs_b, 0),
            axis=-1, keepdims=True, dtype=jnp.float32)
        ok = mass >= top_p  # threshold can be raised
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def filtered_logits(logits, temperature: float, top_p: float):
    """Temperature-scaled, nucleus-filtered f32 logits — the exact target
    distribution sample_logits draws from (softmax of this).  Exposed so
    the speculative sampler's rejection test targets the SAME
    distribution as the sequential loop."""
    logits = logits.astype(jnp.float32) / temperature
    if top_p is not None and top_p < 1.0:
        lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
        kept_min = _topp_threshold_bisect(logits, lse, top_p)
        keep = logits.astype(jnp.bfloat16) >= kept_min.astype(jnp.bfloat16)
        logits = jnp.where(keep, logits, -jnp.inf)
    return logits


def sample_logits(logits, rng, temperature: float, top_p: float):
    """Sample token ids from (B, V) logits with exact nucleus filtering.

    MEASURED (v5e 2026-08-20, headline rollout shapes 64x49152): sampling
    is NOT a bottleneck of the HBM-bound decode step — greedy argmax
    rollouts run 3.43 s/iteration vs 3.43-3.51 with full nucleus sampling,
    so the Gumbel-per-logit threefry + 24-pass bisection cost is hidden
    under the step's weight/KV traffic.  An inverse-CDF variant (one
    uniform per row + cumsum of nucleus-masked probs — same distribution
    exactly) measured SLOWER: 3.71 s/iteration; XLA's 49k-lane cumsum
    costs more than the threefry it saves.  categorical stays."""
    if temperature is None or temperature <= 0.0:
        return jnp.argmax(logits, axis=-1)
    return jax.random.categorical(
        rng, filtered_logits(logits, temperature, top_p), axis=-1)


def _prep_decode(params, text_cfg, prefix_cache, tail_cache,
                 decode_quant=None, head_major: bool = False):
    """Shared decode-loop preamble: split params and both KV caches into
    per-layer buffers (decode is HBM-bound — see _decode_loop docstring),
    apply weight quantization, optionally transpose to the head-major
    flash layout, and quantize the prefix / zero-init int8 tails for
    int8_kv.  Returns (params, layers, prefix_split, tail_split).  Used
    by the sequential loop AND the speculative grouped loop
    (sampler/speculating.py) so the two paths read identical state."""
    from spacer_tpu.models.qwen25_vl.language import split_layers

    L = text_cfg.num_layers
    layer_params = params["model"]["layers"]
    if decode_quant in ("int8", "int8_kv", "int4", "int4_kv"):
        from spacer_tpu.ops.quant import quantize_decode_weights

        layer_params, head_q = quantize_decode_weights(
            layer_params, params["model"].get("lm_head"),
            bits=4 if decode_quant.startswith("int4") else 8)
        if head_q is not None:
            params = dict(params)
            params["model"] = dict(params["model"])
            params["model"]["lm_head"] = head_q
    layers = split_layers(layer_params, L)
    prefix_split = split_layers((prefix_cache["k"], prefix_cache["v"]), L)
    tail_split = split_layers((tail_cache["k"], tail_cache["v"]), L)
    if head_major:
        # flash-decode layout: (B, P, Hkv, Dh) -> (B, Hkv, P, Dh) once per
        # generate call (amortized over the decode); tails are still zeros
        prefix_split = tuple(
            tuple(jnp.transpose(t, (0, 2, 1, 3)) for t in e)
            for e in prefix_split
        )
        tail_split = tuple(
            tuple(jnp.transpose(t, (0, 2, 1, 3)) for t in e)
            for e in tail_split
        )
    if decode_quant in ("int8_kv", "int4_kv"):
        from spacer_tpu.ops.quant import quantize_kv

        def quant_prefix(entry):
            (pk, pv) = entry
            pkq, pks = quantize_kv(pk)
            pvq, pvs = quantize_kv(pv)
            return (pkq, pvq, pks, pvs)

        prefix_split = tuple(quant_prefix(e) for e in prefix_split)

        def quant_tail(entry):
            tk, tv = entry
            shape, sshape = tk.shape, tk.shape[:-1]
            return (jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                    jnp.zeros(sshape, jnp.float32),
                    jnp.zeros(sshape, jnp.float32))

        tail_split = tuple(quant_tail(e) for e in tail_split)
    return params, layers, prefix_split, tail_split


def _decode_loop(
    params, text_cfg, prefix_cache, prefix_mask, tail_cache, first_tokens,
    deltas, prompt_len, group: int, max_new_tokens: int, temperature: float,
    top_p: float, eos_token_id: int, rng, decode_quant=None,
    decode_impl=None,
):
    """Shared-prefix autoregressive loop. Returns tokens (B*G, max_new).

    Decode is HBM-bound, so params and both KV caches are split into
    per-layer buffers ONCE before the loop (_prep_decode): every matmul
    then reads its operand directly instead of paying lax.scan's per-step
    slice copies and stacked tail-cache rebuilds (~2x per-step HBM traffic
    at 2k prefix).

    decode_quant="int8": the loop reads weight-only-quantized layer params
    (ops/quant.py) — half the per-token weight bytes; the one-time
    quantize pass is amortized over max_new_tokens steps.  Prefill and the
    train step stay bf16 (see ops/quant.py docstring for why this is
    sound for GRPO).

    decode_quant="int8_kv": int8 weights AND int8 KV caches (per-vector
    scales, ops/quant.py quantize_kv) — also halves the per-step prefix +
    tail cache reads, the dominant term at long prefixes/completions.

    decode_impl="flash": head-major cache layout + the fused flash-decode
    Pallas kernel (ops/flash_decode.py) — logits/softmax/value matmul stay
    in VMEM and dead tail-bucket space is never read.  "flash_ref" runs
    the same layout through the kernel's XLA reference (CPU-testable).
    None/"xla" keeps the einsum path.
    """
    from spacer_tpu.models.qwen25_vl.language import lm_decode_step_split

    N = first_tokens.shape[0]
    head_major = decode_impl in ("flash", "flash_ref")
    params, layers, prefix_split, tail_split = _prep_decode(
        params, text_cfg, prefix_cache, tail_cache,
        decode_quant=decode_quant, head_major=head_major)

    tokens0 = jnp.zeros((N, max_new_tokens), jnp.int32)
    tokens0 = tokens0.at[:, 0].set(first_tokens.astype(jnp.int32))
    done0 = first_tokens == eos_token_id

    use_kernel = decode_impl == "flash"

    def make_body(bucket: int):
        tail_positions = jnp.arange(bucket)

        def body(state):
            step, tokens, done, tail_split, rng = state
            cur = jax.lax.dynamic_slice(tokens, (0, step - 1), (N, 1))
            # position = prompt_len + delta + (step-1) on all 3 rope axes
            pos = (prompt_len + deltas.reshape(-1) + step - 1).astype(
                jnp.int32)
            pos3 = jnp.broadcast_to(pos[None, :, None], (3, N, 1))
            tail_mask = (None if head_major else jnp.broadcast_to(
                tail_positions[None, :] < step, (N, bucket)
            ))
            logits, tail_split = lm_decode_step_split(
                layers, params["model"], text_cfg, cur, pos3, prefix_split,
                prefix_mask, tail_split, tail_mask, step - 1, group,
                head_major=head_major, tail_len=step,
                use_kernel=use_kernel,
            )
            rng, sub = jax.random.split(rng)
            nxt = sample_logits(logits[:, -1], sub, temperature, top_p)
            nxt = jnp.where(done, jnp.full_like(nxt, eos_token_id), nxt)
            tokens = jax.lax.dynamic_update_slice(
                tokens, nxt[:, None].astype(jnp.int32), (0, step)
            )
            done = done | (nxt == eos_token_id)
            return step + 1, tokens, done, tail_split, rng

        return body

    # Chunked tail cache: attention reads the WHOLE tail buffer every step,
    # so a flat max_new_tokens buffer costs more HBM traffic at long
    # completions than the weights themselves (at C=1024, B*G=32: ~1.6GB vs
    # ~0.7GB int8 weights per token).  Decode runs as segmented while_loops
    # over doubling buckets (128, 256, 512, ...): steps in (start, end]
    # read an end-sized buffer, then the tail copies into the next size up
    # (one linear pass, amortized over the segment).  Early EOS still
    # exits: every segment's cond re-checks `done`.
    bucket = min(128, max_new_tokens)
    boundaries = []
    while bucket < max_new_tokens:
        boundaries.append(bucket)
        bucket *= 2
    boundaries.append(max_new_tokens)

    # the tail-length axis: 1 in the standard (N, T, Hkv[, Dh]) layout,
    # 2 in head-major (N, Hkv, T[, Dh]) — caches AND scales alike
    t_ax = 2 if head_major else 1

    def shrink(ts, size):
        sl = (slice(None),) * t_ax + (slice(None, size),)
        return tuple(tuple(t[sl] for t in entry) for entry in ts)

    def grow(ts, new_size):
        def pad(t):
            shape = t.shape[:t_ax] + (new_size,) + t.shape[t_ax + 1:]
            return jax.lax.dynamic_update_slice(
                jnp.zeros(shape, t.dtype), t, (0,) * t.ndim,
            )

        return tuple(tuple(pad(t) for t in entry) for entry in ts)

    state = (jnp.int32(1), tokens0, done0,
             shrink(tail_split, boundaries[0]), rng)
    prev = boundaries[0]
    for end in boundaries:
        if end != prev:
            step_c, tokens_c, done_c, ts, rng_c = state
            state = (step_c, tokens_c, done_c, grow(ts, end), rng_c)
            prev = end

        def cond(state, end=end):
            step_c, tokens_c, done_c, ts, rng_c = state
            return (step_c < end) & ~jnp.all(done_c)

        state = jax.lax.while_loop(cond, make_body(end), state)
    _, tokens, _, _, _ = state
    return tokens


@functools.partial(
    jax.jit,
    static_argnames=(
        "text_cfg", "num_generations", "max_new_tokens", "temperature",
        "top_p", "eos_token_id", "attn_impl", "decode_quant", "decode_impl",
    ),
)
def _generate_jit(
    params, text_cfg, input_embeds, position_ids, prompt_mask, deltas, rng,
    *, num_generations: int, max_new_tokens: int, temperature: float,
    top_p: float, eos_token_id: int, attn_impl=None, decode_quant=None,
    decode_impl=None,
):
    """Prefill once per prompt; decode with the prompt KV SHARED across the
    G completions (one prefix read per step for the whole group) and a
    per-completion tail cache.  input_embeds: (B, S, D) left-padded."""
    B, S, _ = input_embeds.shape
    G = num_generations

    prefix_cache = init_kv_cache(text_cfg, B, S, dtype=input_embeds.dtype)
    prefix_mask = prompt_mask.astype(bool)
    logits, prefix_cache = lm_forward(
        params["model"], text_cfg, input_embeds=input_embeds,
        position_ids=position_ids, kv_mask=prefix_mask, cache=prefix_cache,
        cache_index=0, attn_impl=attn_impl,
    )
    last_logits = jnp.repeat(logits[:, -1], G, axis=0)  # (B*G, V)
    deltas = jnp.repeat(deltas.reshape(-1), G, axis=0)

    tail_cache = init_kv_cache(text_cfg, B * G, max_new_tokens,
                               dtype=input_embeds.dtype)

    rng, sub = jax.random.split(rng)
    first = sample_logits(last_logits, sub, temperature, top_p)
    tokens = _decode_loop(
        params, text_cfg, prefix_cache, prefix_mask, tail_cache, first,
        deltas, S, G, max_new_tokens, temperature, top_p, eos_token_id, rng,
        decode_quant=decode_quant, decode_impl=decode_impl,
    )
    return tokens


@functools.partial(
    jax.jit,
    static_argnames=(
        "text_cfg", "num_generations", "max_new_tokens", "temperature",
        "top_p", "eos_token_id", "pad_token_id", "attn_impl",
        "decode_quant", "speculate_k",
    ),
)
def _generate_spec_jit(
    params, text_cfg, input_ids, input_embeds, position_ids, prompt_mask,
    deltas, rng, *, num_generations: int, max_new_tokens: int,
    temperature: float, top_p: float, eos_token_id: int, pad_token_id: int,
    speculate_k: int, attn_impl=None, decode_quant=None,
):
    """Speculative variant of _generate_jit: same prefill + shared-prefix
    cache layout, then the block-verification loop
    (sampler/speculating.py) instead of the sequential decode.  Needs the
    prompt token ids (B, S) for n-gram draft lookup.  Returns
    (tokens (B*G, max_new), spec (2,) int32 acceptance telemetry)."""
    from spacer_tpu.sampler.speculating import spec_decode_loop

    B, S, _ = input_embeds.shape
    G = num_generations

    prefix_cache = init_kv_cache(text_cfg, B, S, dtype=input_embeds.dtype)
    prefix_mask = prompt_mask.astype(bool)
    logits, prefix_cache = lm_forward(
        params["model"], text_cfg, input_embeds=input_embeds,
        position_ids=position_ids, kv_mask=prefix_mask, cache=prefix_cache,
        cache_index=0, attn_impl=attn_impl,
    )
    last_logits = jnp.repeat(logits[:, -1], G, axis=0)  # (B*G, V)
    deltas_rep = jnp.repeat(deltas.reshape(-1), G, axis=0)

    tail_cache = init_kv_cache(text_cfg, B * G, max_new_tokens,
                               dtype=input_embeds.dtype)
    params, layers, prefix_split, tail_split = _prep_decode(
        params, text_cfg, prefix_cache, tail_cache,
        decode_quant=decode_quant, head_major=False)

    rng, sub = jax.random.split(rng)
    first = sample_logits(last_logits, sub, temperature, top_p)
    temp = 0.0 if temperature is None else float(temperature)
    return spec_decode_loop(
        params, text_cfg, layers, prefix_split, prefix_mask, tail_split,
        first, input_ids, prompt_mask, deltas_rep, S, G, max_new_tokens,
        temp, top_p, eos_token_id, pad_token_id, speculate_k, rng,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "grid_thw", "attn_impl", "family_name"),
)
def _prologue_jit(params, ids, vision_kwargs, *, cfg, grid_thw, attn_impl,
                  family_name):
    """Embed + vision encode + placeholder merge as ONE compiled program.

    Running this eagerly costs one backend dispatch per op — on a
    remote-relay PJRT backend that fixed overhead (~seconds for the ViT)
    dwarfs the whole decode loop.  vision_kwargs: {} for text-only."""
    from spacer_tpu.models.registry import get_family

    family = get_family(family_name)
    token_embeds = embed_op(params["model"]["embed_tokens"], ids)
    if vision_kwargs:
        ve = family.encode_vision(params, cfg, vision_kwargs, grid_thw,
                                  attn_impl=attn_impl)
        token_embeds = family.merge_vision_embeds(cfg, ids, token_embeds, ve)
    return token_embeds


def completion_mask_from_ids(completion_ids: np.ndarray, eos_token_id: int
                             ) -> np.ndarray:
    """Mask = positions up to and including the first EOS
    (SG_RLVR_trainer.py:493-498 semantics)."""
    is_eos = completion_ids == eos_token_id
    n, L = is_eos.shape
    eos_idx = np.full((n,), L, dtype=np.int64)
    any_eos = is_eos.any(axis=1)
    eos_idx[any_eos] = is_eos.argmax(axis=1)[any_eos]
    seq = np.arange(L)[None, :]
    return (seq <= eos_idx[:, None]).astype(np.int32)


class Sampler:
    """Convenience wrapper owning padding/bucketing around _generate_jit.

    Family-agnostic: the decode engine is shared across model families
    (models/qwen25_vl/language.py); family-specific vision encode/merge
    goes through the models.registry adapter resolved from cfg's type."""

    def __init__(self, cfg, eos_token_id: int | None = None,
                 pad_token_id: int | None = None, attn_impl: str | None = None,
                 length_bucket: int = 128, decode_quant: str | None = None,
                 decode_impl: str | None = None,
                 speculate_k: int | None = None,
                 mesh=None):
        import os

        from spacer_tpu.models.registry import family_for_config

        self.cfg = cfg
        # Explicit mesh placement for rollouts: row-indexed inputs shard
        # their batch dim over the data x fsdp axes (_rollout_spec), so
        # decode COMPUTE partitions across the data axis like the
        # reference's per-rank rollouts (run_SpaceR_SG_RLVR.sh:9-13) —
        # packed pixel patches and rng keys replicate.  Multi-process
        # (DCN): every host must call generate() with the IDENTICAL global
        # host batch (the trainer assembles it with
        # multihost.all_gather_objects); each device then slices its shard
        # out of the local host copy, and outputs are fetched back
        # replicated.  mesh=None (single chip): plain device put.
        self.mesh = mesh
        # the batch PartitionSpec of the last generate()'s inputs —
        # observability for tests/dryrun asserting the rollout actually
        # partitions the batch axis
        self.last_rollout_spec = None
        self.family = family_for_config(cfg)
        self.eos_token_id = eos_token_id if eos_token_id is not None else cfg.eos_token_id
        self.pad_token_id = pad_token_id if pad_token_id is not None else cfg.pad_token_id
        self.attn_impl = attn_impl
        self.length_bucket = length_bucket
        # "int8": weight-only-quantized decode loop (ops/quant.py);
        # "int8_kv": int8 weights + int8 KV caches (quantize_kv);
        # "int4"/"int4_kv": packed-int4 weights (ops/int4_matmul.py
        # Pallas kernel — half the per-token weight bytes again), KV
        # bf16/int8 respectively.  int4 is OPT-IN pending its own
        # rollout-quality A/B (see tools/ab_rollout_quant.py).
        self.decode_quant = (
            decode_quant if decode_quant is not None
            else os.environ.get("SPACER_DECODE_QUANT") or None
        )
        # decode attention impl: "flash" (fused Pallas kernel, head-major
        # caches), "flash_ref" (same layout, XLA math — CPU-testable),
        # "xla" (einsum path), or None = auto (flash on TPU when the
        # kernel's tiling holds, xla otherwise)
        self.decode_impl = (
            decode_impl if decode_impl is not None
            else os.environ.get("SPACER_DECODE_IMPL") or None
        )
        # reject typos up front: a misspelled value silently falling back
        # to the XLA path would make a kernel benchmark measure nothing
        if self.decode_quant not in (None, "int8", "int8_kv",
                                     "int4", "int4_kv"):
            raise ValueError(
                f"unknown decode_quant {self.decode_quant!r} "
                "(expected None, 'int8', 'int8_kv', 'int4' or 'int4_kv')")
        if self.decode_impl not in (None, "xla", "flash", "flash_ref"):
            raise ValueError(
                f"unknown decode_impl {self.decode_impl!r} "
                "(expected None, 'xla', 'flash' or 'flash_ref')")
        # prompt-lookup speculative rollout decode (sampler/speculating.py):
        # kb = 1 + speculate_k tokens verified per block step.  0 = off.
        self.speculate_k = int(
            speculate_k if speculate_k is not None
            else os.environ.get("SPACER_SPEC_K", "0") or 0
        )
        if self.speculate_k < 0:
            raise ValueError(f"speculate_k must be >= 0, got "
                             f"{self.speculate_k}")
        if self.speculate_k > 0 and self.decode_impl in ("flash",
                                                         "flash_ref"):
            raise ValueError(
                "speculative rollout decode uses the position-major block "
                "path; decode_impl='flash'/'flash_ref' has no block "
                "variant — use decode_impl='xla' (or None) with "
                "speculate_k > 0")

    def _resolve_decode_impl(
        self, prompt_bucket: int | None = None,
        max_new_tokens: int | None = None,
    ) -> str | None:
        if self.decode_impl in ("xla",):
            return None
        if self.decode_impl in ("flash", "flash_ref"):
            return self.decode_impl
        # auto: the fused flash-decode kernel on real TPU when its tiling
        # holds, XLA everywhere else.  Measured on-chip 2026-08-18 (v5e,
        # tools/chip_measure_decode.py + bench.py iteration): the
        # whole-batch-per-cell grouped kernel beats the XLA einsum path
        # 1.07x (int8) / 1.13x (bf16) per layer call, and end-to-end the
        # head-major flash rollout cuts the headline iteration's int8
        # rollout phase 3.99s -> 3.43s (6.27 -> 6.63 samples/s/chip).
        # On CPU the Mosaic kernel cannot run (interpret mode is test-only).
        if prompt_bucket is None or max_new_tokens is None:
            return None
        if jax.default_backend() != "tpu":
            return None
        from spacer_tpu.ops.flash_decode import flash_decode_supported

        cfg = self.cfg
        GQ = cfg.text.num_heads // cfg.text.num_kv_heads
        if flash_decode_supported(prompt_bucket, max_new_tokens,
                                  cfg.text.head_dim, GQ):
            return "flash"
        return None

    def _bucket(self, n: int) -> int:
        b = self.length_bucket
        return max(b, -(-n // b) * b)

    def _rollout_spec(self, shape, dim):
        """Batch-dim PartitionSpec for rollout inputs: shard over data x
        fsdp when the batch dim divides (graded fallback data-only, then
        replicate).  This is what makes rollout decode compute SCALE with
        the data axis — the reference's per-rank rollouts
        (run_SpaceR_SG_RLVR.sh:9-13, SG_RLVR_trainer.py:462-481) generate
        on every GPU; a replicated placement would instead decode the
        whole global batch on every device."""
        from jax.sharding import PartitionSpec as P

        for axes in (("data", "fsdp"), ("data",)):
            if not all(a in self.mesh.shape for a in axes):
                continue
            n = int(np.prod([self.mesh.shape[a] for a in axes]))
            if n > 1 and shape[dim] % n == 0:
                return P(*([None] * dim), axes)
        return P()

    def _to_device(self, x, batch_dim: int | None = None):
        """Host array -> device. Multi-process: global array on the mesh
        (x must be IDENTICAL on every host).  batch_dim: row-indexed
        arrays shard that dim over the batch axes (_rollout_spec); None
        (scalars, packed patches, rng keys) replicates."""
        if jax.process_count() > 1 and self.mesh is None:
            raise ValueError(
                "multi-process generate() needs Sampler(mesh=...) so "
                "inputs can be placed as global arrays")
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            x = np.asarray(x)
            spec = P()
            if batch_dim is not None:
                spec = self._rollout_spec(x.shape, batch_dim)
                self.last_rollout_spec = spec
            return jax.make_array_from_callback(
                x.shape, NamedSharding(self.mesh, spec),
                lambda idx: x[idx])
        return jnp.asarray(x)

    def _fetch(self, arr) -> np.ndarray:
        """Device tokens -> host numpy, identical on every process."""
        if jax.process_count() > 1:
            from spacer_tpu.parallel.multihost import fetch_to_host

            return fetch_to_host(arr, self.mesh)
        return np.asarray(arr)

    def generate(
        self,
        input_ids: np.ndarray,          # (B, S) left-padded prompts
        attention_mask: np.ndarray,     # (B, S)
        params,
        *,
        position_ids: np.ndarray,       # (3, B, S)
        deltas: np.ndarray,             # (B, 1) mrope position deltas
        pixel_values: np.ndarray | None = None,
        grid_thw=None,
        vision_kwargs: dict | None = None,   # family-generic alternative
        vision_embeds=None,
        num_generations: int = 1,
        max_new_tokens: int = 1024,
        temperature: float = 1.0,
        top_p: float = 0.95,
        seed: int | jax.Array = 0,
        speculate_k: int | None = None,
    ) -> SampleOutput:
        cfg = self.cfg
        # host-side guard: an out-of-vocab id would hit JAX's out-of-bounds
        # gather, which CLAMPS on CPU but fills NaN on TPU — a silent
        # platform divergence that poisons the whole forward.  Catch it at
        # the library boundary while the ids are still host numpy.
        if int(np.max(input_ids)) >= cfg.text.vocab_size:
            raise ValueError(
                f"input_ids contain id {int(np.max(input_ids))} >= "
                f"vocab_size {cfg.text.vocab_size} (on TPU this becomes a "
                f"NaN embedding, not a clamp)"
            )
        B, S = input_ids.shape
        Sb = self._bucket(S)
        pad = Sb - S
        if pad:
            # extend left padding; positions for pad slots are irrelevant
            input_ids = np.concatenate(
                [np.full((B, pad), self.pad_token_id, input_ids.dtype), input_ids],
                axis=1,
            )
            attention_mask = np.concatenate(
                [np.zeros((B, pad), attention_mask.dtype), attention_mask], axis=1
            )
            position_ids = np.concatenate(
                [np.ones((3, B, pad), position_ids.dtype), position_ids], axis=2
            )
            # delta = max_pos + 1 - seq_len; padding grows seq_len
            deltas = np.asarray(deltas) - pad

        multiproc = jax.process_count() > 1
        ids = self._to_device(input_ids, batch_dim=0)
        if vision_embeds is not None:
            if multiproc:
                raise ValueError(
                    "vision_embeds pass-through is a single-process path; "
                    "multi-process callers pass vision_kwargs")
            token_embeds = _prologue_jit(
                params, ids, {}, cfg=cfg, grid_thw=None,
                attn_impl=self.attn_impl, family_name=self.family.name,
            )
            token_embeds = self.family.merge_vision_embeds(
                cfg, ids, token_embeds, vision_embeds)
        else:
            if vision_kwargs is None and pixel_values is not None:
                # legacy qwen-shaped call (packed patches + static grids)
                vision_kwargs = {"pixel_values": pixel_values}
            vk = {
                k: self._to_device(v)
                for k, v in (vision_kwargs or {}).items()
            }
            token_embeds = _prologue_jit(
                params, ids, vk, cfg=cfg, grid_thw=grid_thw,
                attn_impl=self.attn_impl, family_name=self.family.name,
            )

        rng = seed if isinstance(seed, jax.Array) else jax.random.key(seed)
        if multiproc:
            # typed PRNG key -> replicated global key (same seed everywhere)
            rng = jax.random.wrap_key_data(
                self._to_device(np.asarray(jax.random.key_data(rng))))
        temp = float(temperature) if temperature is not None else 0.0
        topp = float(top_p) if top_p is not None else 1.0
        stats = None
        spec_k = (self.speculate_k if speculate_k is None
                  else int(speculate_k))
        if spec_k > 0:
            tokens, spec = _generate_spec_jit(
                params, cfg.text, ids, token_embeds,
                self._to_device(position_ids, batch_dim=1),
                self._to_device(attention_mask, batch_dim=0),
                self._to_device(deltas, batch_dim=0), rng,
                num_generations=num_generations,
                max_new_tokens=max_new_tokens, temperature=temp,
                top_p=topp, eos_token_id=self.eos_token_id,
                pad_token_id=self.pad_token_id, speculate_k=spec_k,
                attn_impl=self.attn_impl, decode_quant=self.decode_quant,
            )
            tokens = self._fetch(tokens)
            spec = self._fetch(spec)
            mask = completion_mask_from_ids(tokens, self.eos_token_id)
            return SampleOutput(
                sequences=tokens, completion_mask=mask,
                lengths=mask.sum(axis=1),
                stats={
                    "spec_row_steps": int(spec[0]),
                    "spec_tokens": int(spec[1]),
                    "spec_acceptance": float(spec[1]) / max(int(spec[0]), 1),
                },
            )
        resolved_impl = self._resolve_decode_impl(
            prompt_bucket=Sb, max_new_tokens=max_new_tokens)
        if self.decode_impl == "flash":
            # Mosaic legality is enforced on real TPU only (interpret mode
            # passes illegal tilings), so an explicit kernel request with
            # illegal geometry must fail HERE with a clear message, not die
            # in Mosaic lowering on the first decode step (the serving
            # batcher applies the same gate at construction)
            from spacer_tpu.ops.flash_decode import flash_decode_supported

            GQ = cfg.text.num_heads // cfg.text.num_kv_heads
            if not flash_decode_supported(
                    Sb, max_new_tokens, cfg.text.head_dim, GQ):
                raise ValueError(
                    f"decode_impl='flash' needs head_dim 128 and "
                    f"128-multiple buckets; got head_dim="
                    f"{cfg.text.head_dim}, prompt bucket {Sb}, "
                    f"max_new_tokens={max_new_tokens}. Use "
                    f"decode_impl='xla' or adjust the buckets.")
        tokens = _generate_jit(
            params, cfg.text, token_embeds,
            self._to_device(position_ids, batch_dim=1),
            self._to_device(attention_mask, batch_dim=0),
            self._to_device(deltas, batch_dim=0),
            rng,
            num_generations=num_generations,
            max_new_tokens=max_new_tokens,
            temperature=temp, top_p=topp,
            eos_token_id=self.eos_token_id, attn_impl=self.attn_impl,
            decode_quant=self.decode_quant,
            decode_impl=resolved_impl,
        )
        tokens = self._fetch(tokens)
        mask = completion_mask_from_ids(tokens, self.eos_token_id)
        return SampleOutput(
            sequences=tokens, completion_mask=mask, lengths=mask.sum(axis=1),
            stats=stats,
        )
