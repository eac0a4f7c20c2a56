"""Continuous batching: cross-request serving with slot refill.

The reference gets eval/rollout throughput from vLLM's continuous batcher
(vllm_grpo_trainer_modified.py:359-384 funnels every rank's prompts through
one engine; SpaceR-Eval runs 4 GPU workers of batched generate).  Static
batching on TPU wastes decode steps: a jitted batch must run until its
LONGEST row finishes, so short answers idle their slot.  This module keeps
a fixed number of decode slots busy instead:

  host                                 device (jit)
  ----                                 ------------
  queue of requests       --admit----> prefill + KV insert into slot r
                                       (ONE program per admission)
  every chunk_steps steps <--fetch---- done flags / emitted counts
  finished slot harvested --admit----> next request refills the slot

Decode runs in chunks of `chunk_steps` lax.while_loop iterations per jit
call (early exit when every slot is done), with the state donated so the
caches update in place.  Slots admitted at different times sit at
different depths — the clock-ring KV layout that makes the per-step write
a plain dynamic_update_slice (no scatter) lives in serving/ragged.py.

Design notes (TPU-first):
- per-slot prefix cache (prompt_len) + shared-clock completion ring
  (max_new_tokens); no paged KV — XLA wants static shapes, and at slot
  counts this small page tables buy nothing over dense per-slot buffers.
- admission is ONE jit call (prefill forward + first-token sample + cache
  insert); on a remote-relay backend per-call dispatch costs dominate
  small programs, so fusing the admission path matters as much as the
  math.  The vision prologue stays a separate program (static grid
  shapes).
- weights optionally int8 (ops/quant.py) — serving reads weights every
  step, same argument as the rollout sampler's decode_quant.
"""

from __future__ import annotations

import dataclasses
import functools
from collections import deque
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spacer_tpu.models.qwen25_vl.language import (
    init_kv_cache,
    lm_forward,
    split_layers,
)
from spacer_tpu.sampler.sampler import (
    _prologue_jit,
    completion_mask_from_ids,
    sample_logits,
)
from spacer_tpu.serving.ragged import ragged_decode_step


@dataclasses.dataclass
class ServedOutput:
    sequences: np.ndarray   # (Cmax,) token ids (garbage past length)
    length: int             # emitted tokens incl. the first EOS


@functools.partial(
    jax.jit,
    static_argnames=("text_cfg", "attn_impl", "temperature", "top_p",
                     "eos_token_id", "head_major"),
    donate_argnums=(0,),
)
def _admit_jit(state, params, input_ids, input_embeds, position_ids,
               prompt_mask, delta, max_new, slot, src=None, *, text_cfg,
               attn_impl=None, temperature, top_p, eos_token_id,
               head_major: bool = False):
    """Prefill Bu UNIQUE prompts and insert them into Bq slots — one
    program.

    input_ids (Bu, Pmax); input_embeds (Bu, Pmax, D) left-padded (from the
    vision prologue) or None for text-only requests — then the embedding
    lookup happens here, folding the whole admission into a single dispatch
    (per-call dispatch costs rival the prefill compute on a remote-relay
    backend).  delta/max_new/slot: (Bq,); src: (Bq,) int32 mapping each
    admission to its unique prefill row (None = identity, Bu == Bq).

    Bu < Bq is the prefix-caching role of the reference's vLLM engine
    (enable_prefix_caching=True, vllm_grpo_trainer_modified.py:367): an
    n-sampling wave (OpenAI `n`, distillation num_generations) prefills
    the shared prompt ONCE and fans the KV out to the clone slots, each
    clone sampling its own first token.

    Duplicate rows targeting the same slot are allowed and idempotent-by-
    last-write (the host pads admission waves to a power-of-two Bq by
    repeating the final admission, so only a few program shapes compile;
    unique rows pad to a power-of-two Bu the same way).
    """
    if input_embeds is None:
        from spacer_tpu.nn.core import embed as embed_op

        input_embeds = embed_op(params["model"]["embed_tokens"], input_ids)
    Bu, S, _ = input_embeds.shape
    B = slot.shape[0]
    if src is None:
        src = jnp.arange(B, dtype=jnp.int32)
    cache = init_kv_cache(text_cfg, Bu, S, dtype=input_embeds.dtype)
    logits, cache = lm_forward(
        params["model"], text_cfg, input_embeds=input_embeds,
        position_ids=position_ids, kv_mask=prompt_mask.astype(bool),
        cache=cache, cache_index=0, attn_impl=attn_impl,
    )
    pk_all, pv_all = cache["k"], cache["v"]  # (L, Bu, Pmax, Hkv, Dh)
    if head_major:
        # flash-decode slab layout: (…, Pmax, Hkv, Dh) -> (…, Hkv, Pmax, Dh)
        pk_all = jnp.transpose(pk_all, (0, 1, 3, 2, 4))
        pv_all = jnp.transpose(pv_all, (0, 1, 3, 2, 4))

    L = text_cfg.num_layers
    caches = list(state["caches"])
    quant = len(caches[0]) == 8
    if quant:
        from spacer_tpu.ops.quant import quantize_kv

        pk_q, pk_s = quantize_kv(pk_all)
        pv_q, pv_s = quantize_kv(pv_all)

    def row(arr, l, b):
        """arr[l, src[b]][None] via a dynamic gather (src is traced so the
        (Bq, Bu) shape pair, not the dup pattern, keys the compile)."""
        return jax.lax.dynamic_index_in_dim(arr[l], src[b], 0,
                                            keepdims=True)

    for l in range(L):
        entry = list(caches[l])
        for b in range(B):
            entry[0] = jax.lax.dynamic_update_slice(
                entry[0], row(pk_q if quant else pk_all, l, b).astype(
                    entry[0].dtype), (slot[b], 0, 0, 0))
            entry[1] = jax.lax.dynamic_update_slice(
                entry[1], row(pv_q if quant else pv_all, l, b).astype(
                    entry[1].dtype), (slot[b], 0, 0, 0))
            if quant:
                entry[4] = jax.lax.dynamic_update_slice(
                    entry[4], row(pk_s, l, b), (slot[b], 0, 0))
                entry[5] = jax.lax.dynamic_update_slice(
                    entry[5], row(pv_s, l, b), (slot[b], 0, 0))
        caches[l] = tuple(entry)

    # per-ADMISSION views of the unique rows (clones share these)
    pmask_adm = jnp.take(prompt_mask, src, axis=0)        # (Bq, Pmax)
    pids_adm = jnp.take(input_ids.astype(jnp.int32), src, axis=0)
    logits_adm = jnp.take(logits[:, -1], src, axis=0)     # (Bq, V)

    rng, sub = jax.random.split(state["rng"])
    # one batched sample: every clone draws its own first token (vLLM
    # n-sampling semantics — identical only under greedy)
    first = sample_logits(logits_adm, sub, temperature, top_p)
    first = first.astype(jnp.int32)  # (Bq,)

    def at(arr, vals):
        for b in range(B):
            arr = jax.lax.dynamic_update_slice(
                arr, jnp.asarray(vals[b], arr.dtype).reshape(
                    (1,) + arr.shape[1:]),
                (slot[b],) + (0,) * (arr.ndim - 1))
        return arr

    Cmax = state["out"].shape[1]
    out_rows = jnp.zeros((B, Cmax), jnp.int32).at[:, 0].set(first)
    return {
        "caches": tuple(caches),
        "pmask": at(state["pmask"], pmask_adm),
        "pids": at(state["pids"], pids_adm),
        "delta": at(state["delta"], delta),
        "admit": at(state["admit"],
                    jnp.broadcast_to(state["clock"], (B,))),
        "cur": at(state["cur"], first),
        "t": at(state["t"], jnp.ones((B,), jnp.int32)),
        "done": at(state["done"],
                   (first == eos_token_id) | (max_new <= 1)),
        "maxnew": at(state["maxnew"], max_new),
        "out": at(state["out"], out_rows),
        "clock": state["clock"],
        "spec": state["spec"],
        "rng": rng,
    }


@functools.partial(
    jax.jit,
    static_argnames=("text_cfg", "chunk_steps", "temperature", "top_p",
                     "eos_token_id", "head_major", "use_kernel"),
    donate_argnums=(0,),
)
def _chunk_jit(state, layer_params, other_params, *, text_cfg, chunk_steps,
               temperature, top_p, eos_token_id, head_major: bool = False,
               use_kernel: bool = False):
    """Run up to chunk_steps ring decode steps (early exit on all-done)."""
    L = text_cfg.num_layers
    layers = split_layers(layer_params, L)
    R, Pmax = state["pmask"].shape
    Cmax = state["out"].shape[1]
    ring_iota = jnp.arange(Cmax)
    rows = jnp.arange(R)
    pmask = state["pmask"].astype(bool)
    admit = state["admit"]
    delta = state["delta"]
    maxnew = state["maxnew"]

    def body(carry):
        i, caches, cur, t, done, out, clock, rng = carry
        was_done = done
        ring_idx = jnp.mod(clock, Cmax)
        # cur is token #(t-1): rope position prompt_len + delta + (t-1);
        # its KV lands at ring position clock % Cmax, and for an active row
        # (clock - admit) == t - 1, so the ring window mask
        # (j - admit) mod Cmax < t covers it.
        pos = (Pmax + delta + t - 1).astype(jnp.int32)
        pos3 = jnp.broadcast_to(pos[None, :, None], (3, R, 1))
        rel = jnp.mod(ring_iota[None, :] - admit[:, None], Cmax)
        ring_mask = rel < t[:, None]
        logits, caches = ragged_decode_step(
            layers, other_params, text_cfg, cur, pos3, caches,
            ring_idx, pmask, ring_mask, head_major=head_major,
            use_kernel=use_kernel)
        rng, sub = jax.random.split(rng)
        nxt = sample_logits(logits, sub, temperature, top_p).astype(jnp.int32)
        tw = jnp.minimum(t, Cmax - 1)
        keep_tok = out[rows, tw]
        out = out.at[rows, tw].set(jnp.where(was_done, keep_tok, nxt))
        t = jnp.where(was_done, t, t + 1)
        done = was_done | (nxt == eos_token_id) | (t >= maxnew)
        cur = jnp.where(was_done, cur, nxt)
        return i + 1, caches, cur, t, done, out, clock + 1, rng

    def cond(carry):
        i, _, _, _, done, _, _, _ = carry
        return (i < chunk_steps) & ~jnp.all(done)

    init = (jnp.int32(0), state["caches"], state["cur"], state["t"],
            state["done"], state["out"], state["clock"], state["rng"])
    _, caches, cur, t, done, out, clock, rng = jax.lax.while_loop(
        cond, body, init)
    return {
        "caches": caches, "pmask": state["pmask"], "pids": state["pids"],
        "delta": state["delta"],
        "admit": state["admit"], "cur": cur, "t": t, "done": done,
        "maxnew": state["maxnew"], "out": out, "clock": clock,
        "spec": state["spec"], "rng": rng,
    }


class ContinuousBatcher:
    """Slot-based continuous batching over the clock-ring decode step.

    run() drives a request list to completion.  All requests share one
    static geometry (prompt_len bucket, max completion length) — callers
    bucket by prompt length if their mix is wide.
    """

    def __init__(self, cfg, params, *, slots: int = 8,
                 prompt_len: int = 512, max_new_tokens: int = 128,
                 eos_token_id: Optional[int] = None,
                 pad_token_id: Optional[int] = None,
                 temperature: float = 0.0, top_p: float = 1.0,
                 attn_impl: Optional[str] = None,
                 decode_quant: Optional[str] = None,
                 decode_impl: Optional[str] = None,
                 speculate_k: int = 0,
                 chunk_steps: int = 32, seed: int = 0,
                 dtype=jnp.bfloat16):
        from spacer_tpu.models.registry import family_for_config

        self.cfg = cfg
        self.family = family_for_config(cfg)
        self.params = params
        self.R = slots
        self.Pmax = prompt_len
        self.Cmax = max_new_tokens
        # decode attention impl, same contract as Sampler.decode_impl:
        # "flash" = head-major caches + fused Pallas kernel, "flash_ref" =
        # same layout via XLA (CPU-testable), "xla"/None-on-CPU = einsum
        if decode_impl is None:
            import os

            decode_impl = os.environ.get("SPACER_DECODE_IMPL") or None
        if decode_impl in ("flash", "flash_ref"):
            resolved = decode_impl
            if decode_impl == "flash":
                # Mosaic legality is enforced on real TPU only (interpret
                # mode passes illegal tilings), so an explicit kernel
                # request with illegal buckets must fail HERE with a clear
                # message, not crash the first decode_chunk
                from spacer_tpu.ops.flash_decode import flash_decode_supported

                if not flash_decode_supported(
                        prompt_len, max_new_tokens, cfg.text.head_dim, 1):
                    raise ValueError(
                        f"decode_impl='flash' needs head_dim 128 and "
                        f"128-multiple buckets; got head_dim="
                        f"{cfg.text.head_dim}, prompt_len={prompt_len}, "
                        f"max_new_tokens={max_new_tokens}. Use "
                        f"decode_impl='xla' or adjust the buckets.")
        elif decode_impl in (None, "xla"):
            # auto = XLA: measured on-chip (tools/chip_measure_decode.py,
            # v5e 2026-08-18) the fused ring kernel is a dead heat with
            # the einsum path at serving shapes — 158.2 vs 157.9 us/call
            # int8, 196.5 vs 196.6 us/call bf16 — so the simpler XLA path
            # keeps the default (the grouped SAMPLER kernel, by contrast,
            # wins 7-13% and auto-resolves to flash there)
            resolved = None
        else:
            raise ValueError(
                f"unknown decode_impl {decode_impl!r} "
                "(expected None, 'xla', 'flash' or 'flash_ref')")
        self.head_major = resolved in ("flash", "flash_ref")
        self.use_kernel = resolved == "flash"
        self.eos = eos_token_id if eos_token_id is not None \
            else cfg.eos_token_id
        self.pad = pad_token_id if pad_token_id is not None \
            else cfg.pad_token_id
        self.temperature = float(temperature) if temperature else 0.0
        self.top_p = float(top_p) if top_p is not None else 1.0
        self.attn_impl = attn_impl
        self.chunk_steps = chunk_steps
        self.dtype = dtype

        if decode_quant not in (None, "int8", "int8_kv",
                                "int4", "int4_kv"):
            raise ValueError(
                f"unknown decode_quant {decode_quant!r} "
                "(expected None, 'int8', 'int8_kv', 'int4' or 'int4_kv')")
        # speculative decoding (serving/speculative.py): position-major
        # caches only; greedy is bit-exact, sampling is exact-in-
        # distribution (rejection rule)
        self.speculate_k = int(speculate_k)
        if self.speculate_k < 0:
            raise ValueError(f"speculate_k must be >= 0, got {speculate_k}")
        if self.speculate_k:
            if self.head_major:
                raise ValueError(
                    "speculate_k uses the position-major cache layout; "
                    "drop decode_impl='flash'/'flash_ref'")
        layer_params = params["model"]["layers"]
        other = {k: v for k, v in params["model"].items() if k != "layers"}
        if decode_quant in ("int8", "int8_kv", "int4", "int4_kv"):
            from spacer_tpu.ops.quant import quantize_decode_weights

            layer_params, head_q = jax.jit(functools.partial(
                quantize_decode_weights,
                bits=4 if decode_quant.startswith("int4") else 8))(
                layer_params, other.get("lm_head"))
            if head_q is not None:
                other = dict(other)
                other["lm_head"] = head_q
        self.layer_params = layer_params
        self.other_params = other

        tc = cfg.text
        if self.head_major:
            pshape = (self.R, tc.num_kv_heads, self.Pmax, tc.head_dim)
            tshape = (self.R, tc.num_kv_heads, self.Cmax, tc.head_dim)
        else:
            pshape = (self.R, self.Pmax, tc.num_kv_heads, tc.head_dim)
            tshape = (self.R, self.Cmax, tc.num_kv_heads, tc.head_dim)
        if decode_quant in ("int8_kv", "int4_kv"):
            # int8 codes + (R, T, Hkv) f32 scales, read via the same
            # logit/prob scale-folding as the grouped decoder (int4 only
            # quantizes WEIGHTS further; KV stays int8); fresh buffers per
            # layer (donation must never see aliased inputs)
            def mk_entry():
                return (
                    jnp.zeros(pshape, jnp.int8), jnp.zeros(pshape, jnp.int8),
                    jnp.zeros(tshape, jnp.int8), jnp.zeros(tshape, jnp.int8),
                    jnp.zeros(pshape[:-1], jnp.float32),
                    jnp.zeros(pshape[:-1], jnp.float32),
                    jnp.zeros(tshape[:-1], jnp.float32),
                    jnp.zeros(tshape[:-1], jnp.float32),
                )
        else:
            def mk_entry():
                return (
                    jnp.zeros(pshape, dtype), jnp.zeros(pshape, dtype),
                    jnp.zeros(tshape, dtype), jnp.zeros(tshape, dtype),
                )
        self.state = {
            "caches": tuple(mk_entry() for _ in range(tc.num_layers)),
            "pmask": jnp.zeros((self.R, self.Pmax), jnp.int32),
            "pids": jnp.zeros((self.R, self.Pmax), jnp.int32),
            "delta": jnp.zeros((self.R,), jnp.int32),
            "admit": jnp.zeros((self.R,), jnp.int32),
            "cur": jnp.zeros((self.R,), jnp.int32),
            "t": jnp.zeros((self.R,), jnp.int32),
            "done": jnp.ones((self.R,), bool),   # empty slots read as done
            "maxnew": jnp.zeros((self.R,), jnp.int32),
            "out": jnp.zeros((self.R, self.Cmax), jnp.int32),
            "clock": jnp.int32(0),
            # [speculative steps run, tokens emitted by them] — the
            # acceptance telemetry for speculate_k > 0 (spec_stats)
            "spec": jnp.zeros((2,), jnp.int32),
            "rng": jax.random.key(seed),
        }
        self._slot_req: list[Optional[int]] = [None] * self.R

    # -- request normalization ------------------------------------------

    def _pad_request(self, req: dict):
        """Left-pad a single-prompt request to the Pmax bucket."""
        ids = np.asarray(req["input_ids"])
        mask = np.asarray(req["attention_mask"])
        pos = np.asarray(req["position_ids"])
        delta = int(np.asarray(req.get("deltas", 0)).reshape(-1)[0])
        if ids.shape[0] != 1:
            raise ValueError("one prompt per request")
        if int(ids.max()) >= self.cfg.text.vocab_size:
            raise ValueError(
                f"input_ids contain id {int(ids.max())} >= vocab_size "
                f"{self.cfg.text.vocab_size} (on TPU this becomes a NaN "
                f"embedding, not a clamp)"
            )
        S = ids.shape[1]
        if S > self.Pmax:
            raise ValueError(f"prompt len {S} exceeds bucket {self.Pmax}")
        pad = self.Pmax - S
        if pad:
            ids = np.concatenate(
                [np.full((1, pad), self.pad, ids.dtype), ids], 1)
            mask = np.concatenate([np.zeros((1, pad), mask.dtype), mask], 1)
            pos = np.concatenate(
                [np.ones((3, 1, pad), pos.dtype), pos], 2)
            delta -= pad
        return ids, mask, pos, delta

    def validate_request(self, req: dict) -> None:
        """Host-side validation of a single request (prompt shape, vocab
        range, bucket fit) — raises ValueError without touching device
        state.  The online ServingLoop calls this at submit() time so one
        malformed request fails alone; any error past admission is treated
        as device-state corruption and kills the loop."""
        self._pad_request(req)

    def _admit_wave(self, admissions: list):
        """Admit [(req, budget, slot), ...] in ONE program.  The wave pads
        to a power-of-two admission count by repeating the last admission
        (idempotent: duplicate rows write the same slot sequentially), so
        only log2(slots)+1 admission shapes ever compile.

        Identical prompts within the wave prefill ONCE (vision prologue
        included) and fan their KV out to every clone slot — the
        reference vLLM engine's enable_prefix_caching role for n-sampling
        (OpenAI `n`, distillation num_generations).  Text prompts dedupe
        by token content; vision prompts by vision_kwargs object identity
        (the n-path reuses the same dict, so clones share the prologue)."""
        Bq = 1 << (len(admissions) - 1).bit_length()
        padded = admissions + [admissions[-1]] * (Bq - len(admissions))

        uniq_index, uniq, src = {}, [], []
        for req, _budget, _slot in padded:
            vk = req.get("vision_kwargs") or None
            key = (np.asarray(req["input_ids"]).tobytes(),
                   np.asarray(req["attention_mask"]).tobytes(),
                   id(vk) if vk is not None else None)
            if key not in uniq_index:
                uniq_index[key] = len(uniq)
                uniq.append(req)
            src.append(uniq_index[key])
        Bu = 1 << (len(uniq) - 1).bit_length()
        uniq = uniq + [uniq[-1]] * (Bu - len(uniq))

        ids_l, mask_l, pos_l, deltas_u, embeds_l = [], [], [], [], []
        any_vision = any(r.get("vision_kwargs") for r in uniq)
        for req in uniq:
            ids, mask, pos, delta = self._pad_request(req)
            if any_vision:
                vk = {k: jnp.asarray(v)
                      for k, v in (req.get("vision_kwargs") or {}).items()}
                embeds_l.append(_prologue_jit(
                    self.params, jnp.asarray(ids), vk, cfg=self.cfg,
                    grid_thw=req.get("grid_thw"), attn_impl=self.attn_impl,
                    family_name=self.family.name,
                ).astype(self.dtype))
            ids_l.append(ids)
            mask_l.append(mask.astype(np.int32))
            pos_l.append(pos)
            deltas_u.append(delta)
        embeds = jnp.concatenate(embeds_l, axis=0) if any_vision else None

        deltas = [deltas_u[s] for s in src]
        budgets = [b for _r, b, _s in padded]
        slots = [s for _r, _b, s in padded]
        self.state = _admit_jit(
            self.state, self.params,
            jnp.asarray(np.concatenate(ids_l, 0)), embeds,
            jnp.asarray(np.concatenate(pos_l, 1)),
            jnp.asarray(np.concatenate(mask_l, 0)),
            jnp.asarray(np.asarray(deltas, np.int32)),
            jnp.asarray(np.asarray(budgets, np.int32)),
            jnp.asarray(np.asarray(slots, np.int32)),
            jnp.asarray(np.asarray(src, np.int32)),
            text_cfg=self.cfg.text, attn_impl=self.attn_impl,
            temperature=self.temperature, top_p=self.top_p,
            eos_token_id=self.eos, head_major=self.head_major)

    # -- serving loop ----------------------------------------------------

    # -- step primitives (shared by run() and the online ServingLoop) -----

    def budget_of(self, req: dict, max_new: Optional[int] = None) -> int:
        return min(int(req.get("max_new_tokens", max_new or self.Cmax)),
                   self.Cmax)

    def free_slots(self) -> list[int]:
        return [r for r in range(self.R) if self._slot_req[r] is None]

    def has_active(self) -> bool:
        return any(i is not None for i in self._slot_req)

    def admit(self, admissions: list) -> None:
        """admissions: list of (tag, request, budget, slot).  `tag` is an
        opaque caller handle returned by poll_finished."""
        for tag, _req, _budget, slot in admissions:
            assert self._slot_req[slot] is None, f"slot {slot} busy"
            self._slot_req[slot] = tag
        self._admit_wave([(req, budget, slot)
                          for _tag, req, budget, slot in admissions])

    def decode_chunk(self) -> None:
        """Run up to chunk_steps decode steps (one program): clock-ring
        single-token steps, or speculative block steps (speculate_k)."""
        if self.speculate_k:
            from spacer_tpu.serving.speculative import spec_chunk_jit

            self.state = spec_chunk_jit(
                self.state, self.layer_params, self.other_params,
                text_cfg=self.cfg.text, chunk_steps=self.chunk_steps,
                speculate_k=self.speculate_k, eos_token_id=self.eos,
                pad_token_id=self.pad, temperature=self.temperature,
                top_p=self.top_p)
            return
        self.state = _chunk_jit(
            self.state, self.layer_params, self.other_params,
            chunk_steps=self.chunk_steps, head_major=self.head_major,
            use_kernel=self.use_kernel, text_cfg=self.cfg.text,
            temperature=self.temperature, top_p=self.top_p,
            eos_token_id=self.eos)

    @property
    def spec_stats(self) -> dict:
        """{'steps', 'tokens'} over speculative block ROW-steps (one unit
        = one active row in one block program, i.e. what a sequential
        decode spends to emit one token) — tokens/steps is the mean
        per-row acceptance incl. the bonus token; 1.0 means speculation
        never helped."""
        steps, tokens = (int(x) for x in np.asarray(self.state["spec"]))
        return {"steps": steps, "tokens": tokens}

    def poll_finished(self) -> list:
        """Collect (tag, ServedOutput) for slots that finished; frees them.

        Fetches the small per-slot flags every call; the (R, Cmax) token
        buffer only moves host-side when something actually finished."""
        done = np.asarray(self.state["done"])
        ts = np.asarray(self.state["t"])
        finished = [r for r in range(self.R)
                    if self._slot_req[r] is not None and bool(done[r])]
        results = []
        if finished:
            out = np.asarray(self.state["out"])
            for r in finished:
                tag = self._slot_req[r]
                seq = out[r]
                cmask = completion_mask_from_ids(seq[None], self.eos)[0]
                length = int(min(cmask.sum(), ts[r]))
                results.append((tag, ServedOutput(sequences=seq,
                                                  length=length)))
                self._slot_req[r] = None
        return results

    def poll_progress(self) -> list:
        """(tag, token_row, t) for every ACTIVE slot — the streaming feed.

        Unlike poll_finished this fetches the (R, Cmax) token buffer every
        call, so the serving loop only invokes it while a streaming
        request is in flight.  token_row[:t] is exactly the emitted
        tokens (writes stop at done, so at most one trailing EOS)."""
        ts = np.asarray(self.state["t"])
        out = np.asarray(self.state["out"])
        return [(self._slot_req[r], out[r], int(ts[r]))
                for r in range(self.R) if self._slot_req[r] is not None]

    def run(self, requests: Sequence[dict],
            max_new_tokens: Optional[int] = None) -> list[ServedOutput]:
        """Drive all requests to completion; returns outputs in order.

        A request may carry its own "max_new_tokens" (clamped to the
        bucket); otherwise `max_new_tokens` (default: the bucket) applies.
        """
        max_new = int(max_new_tokens or self.Cmax)
        if max_new > self.Cmax:
            raise ValueError(f"max_new {max_new} exceeds bucket {self.Cmax}")
        results: list[Optional[ServedOutput]] = [None] * len(requests)

        # longest-declared-budget-first (LPT): with heterogeneous budgets
        # this keeps the drain phase short — a 1024-budget request admitted
        # last would otherwise run alone at the end.  Declared budgets only
        # (actual EOS lengths are unknowable in advance); results keep the
        # caller's order.
        order = sorted(range(len(requests)),
                       key=lambda i: -self.budget_of(requests[i], max_new))
        queue = deque((i, requests[i]) for i in order)

        while queue or self.has_active():
            admissions = []
            for slot in self.free_slots():
                if not queue:
                    break
                i, req = queue.popleft()
                admissions.append((i, req, self.budget_of(req, max_new),
                                   slot))
            if admissions:
                self.admit(admissions)
            self.decode_chunk()
            for i, served in self.poll_finished():
                results[i] = served
        return results  # type: ignore[return-value]
