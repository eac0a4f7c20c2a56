"""Continuous batching: cross-request serving with slot refill.

The reference gets eval/rollout throughput from vLLM's continuous batcher
(vllm_grpo_trainer_modified.py:359-384 funnels every rank's prompts through
one engine; SpaceR-Eval runs 4 GPU workers of batched generate).  Static
batching on TPU wastes decode steps: a jitted batch must run until its
LONGEST row finishes, so short answers idle their slot.  This module keeps
a fixed number of decode slots busy instead:

  host                                 device (jit)
  ----                                 ------------
  queue of requests       --prefill--> per-request prompt KV (one program)
  free slot r             --insert---> scatter prompt KV into slot r
  every chunk_steps steps <--fetch---- done flags / emitted counts
  finished slot harvested --refill---> next request prefills into the slot

Decode runs in chunks of `chunk_steps` lax.while_loop iterations per jit
call (early exit when every slot is done), with the state donated so the
caches update in place.  Slots admitted at different times sit at different
depths — the per-row write index / mask machinery lives in
serving/ragged.py.

Design notes (TPU-first):
- one merged cache per slot (prompt_len + max_new static length); no paged
  KV — XLA wants static shapes, and at slot counts this small page tables
  buy nothing over dense per-slot buffers.
- prefill is its own jit at the prompt bucket width; admission cost is one
  prompt forward, decoding slots stall for it (acceptable: prefill is
  compute-bound and ~1 decode-chunk long; overlap would need a second
  device).
- weights optionally int8 (ops/quant.py) — serving reads weights every
  step, same argument as the rollout sampler's decode_quant.
"""

from __future__ import annotations

import dataclasses
import functools
from collections import deque
from typing import Any, Optional, Sequence

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


@functools.partial(jax.jit, static_argnames=("text_cfg", "attn_impl"))
def _prefill_jit(params, input_embeds, position_ids, prompt_mask,
                 *, text_cfg, attn_impl=None):
    """One-prompt prefill -> (k, v (L, Pmax, Hkv, Dh), last-token logits)."""
    B, S, _ = input_embeds.shape
    cache = init_kv_cache(text_cfg, B, S, dtype=input_embeds.dtype)
    logits, cache = lm_forward(
        params["model"], text_cfg, input_embeds=input_embeds,
        position_ids=position_ids, kv_mask=prompt_mask.astype(bool),
        cache=cache, cache_index=0, attn_impl=attn_impl,
    )
    return cache["k"][:, 0], cache["v"][:, 0], logits[0, -1]


@functools.partial(
    jax.jit,
    static_argnames=("text_cfg", "temperature", "top_p", "eos_token_id"),
    donate_argnums=(0,),
)
def _insert_jit(state, pk, pv, logits, pmask_row, delta, max_new, slot,
                *, text_cfg, temperature, top_p, eos_token_id):
    """Admit a prefilled request into slot `slot` (dynamic scalar index)."""
    L = text_cfg.num_layers
    caches = list(state["caches"])
    for l in range(L):
        ck, cv = caches[l]
        ck = jax.lax.dynamic_update_slice(
            ck, pk[l][None].astype(ck.dtype), (slot, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(
            cv, pv[l][None].astype(cv.dtype), (slot, 0, 0, 0))
        caches[l] = (ck, cv)

    rng, sub = jax.random.split(state["rng"])
    first = sample_logits(logits[None], sub, temperature, top_p)[0]
    first = first.astype(jnp.int32)

    def at(arr, val):
        return jax.lax.dynamic_update_slice(
            arr, jnp.asarray(val, arr.dtype).reshape(
                (1,) + arr.shape[1:]), (slot,) + (0,) * (arr.ndim - 1))

    out_row = jnp.zeros((state["out"].shape[1],), jnp.int32).at[0].set(first)
    return {
        "caches": tuple(caches),
        "pmask": at(state["pmask"], pmask_row),
        "delta": at(state["delta"], delta),
        "cur": at(state["cur"], first),
        "t": at(state["t"], 1),
        "done": at(state["done"],
                   (first == eos_token_id) | (max_new <= 1)),
        "maxnew": at(state["maxnew"], max_new),
        "out": at(state["out"], out_row),
        "rng": rng,
    }


@functools.partial(
    jax.jit,
    static_argnames=("text_cfg", "chunk_steps", "temperature", "top_p",
                     "eos_token_id"),
    donate_argnums=(0,),
)
def _chunk_jit(state, layer_params, other_params, *, text_cfg, chunk_steps,
               temperature, top_p, eos_token_id):
    """Run up to chunk_steps ragged decode steps (early exit on all-done)."""
    L = text_cfg.num_layers
    layers = split_layers(layer_params, L)
    R, Pmax = state["pmask"].shape
    Cmax = state["out"].shape[1]
    tail_iota = jnp.arange(Cmax)
    rows = jnp.arange(R)

    def body(carry):
        i, caches, cur, t, done, out, rng = carry
        was_done = done
        # cur is token #(t-1): its KV writes at Pmax+t-1, rope position is
        # prompt_len + delta + (t-1) on all three axes (text-only decode)
        widx = Pmax + t - 1
        pos = (Pmax + state["delta"] + t - 1).astype(jnp.int32)
        pos3 = jnp.broadcast_to(pos[None, :, None], (3, R, 1))
        kv_mask = jnp.concatenate(
            [state["pmask"].astype(bool),
             tail_iota[None, :] <= (t - 1)[:, None]], axis=1)
        logits, caches = ragged_decode_step(
            layers, other_params, text_cfg, cur, pos3, caches, widx, kv_mask)
        rng, sub = jax.random.split(rng)
        nxt = sample_logits(logits, sub, temperature, top_p).astype(jnp.int32)
        tw = jnp.minimum(t, Cmax - 1)
        keep = out[rows, tw]
        out = out.at[rows, tw].set(jnp.where(was_done, keep, nxt))
        t = jnp.where(was_done, t, t + 1)
        done = was_done | (nxt == eos_token_id) | (t >= state["maxnew"])
        cur = jnp.where(was_done, cur, nxt)
        return i + 1, caches, cur, t, done, out, rng

    def cond(carry):
        i, _, _, _, done, _, _ = carry
        return (i < chunk_steps) & ~jnp.all(done)

    init = (jnp.int32(0), state["caches"], state["cur"], state["t"],
            state["done"], state["out"], state["rng"])
    _, caches, cur, t, done, out, rng = jax.lax.while_loop(cond, body, init)
    return {
        "caches": caches, "pmask": state["pmask"], "delta": state["delta"],
        "cur": cur, "t": t, "done": done, "maxnew": state["maxnew"],
        "out": out, "rng": rng,
    }


class ContinuousBatcher:
    """Slot-based continuous batching over the ragged decode step.

    run() drives a request list to completion; submit()/drain() expose the
    same machinery incrementally.  All requests share one static geometry
    (prompt_len bucket, max completion length) — callers bucket by prompt
    length if their mix is wide.
    """

    def __init__(self, cfg, params, *, slots: int = 8,
                 prompt_len: int = 512, max_new_tokens: int = 128,
                 eos_token_id: Optional[int] = None,
                 pad_token_id: Optional[int] = None,
                 temperature: float = 0.0, top_p: float = 1.0,
                 attn_impl: Optional[str] = None,
                 decode_quant: Optional[str] = None,
                 chunk_steps: int = 32, seed: int = 0,
                 dtype=jnp.bfloat16):
        from spacer_tpu.models.registry import family_for_config

        self.cfg = cfg
        self.family = family_for_config(cfg)
        self.params = params
        self.R = slots
        self.Pmax = prompt_len
        self.Cmax = max_new_tokens
        self.eos = eos_token_id if eos_token_id is not None \
            else cfg.eos_token_id
        self.pad = pad_token_id if pad_token_id is not None \
            else cfg.pad_token_id
        self.temperature = float(temperature) if temperature else 0.0
        self.top_p = float(top_p) if top_p is not None else 1.0
        self.attn_impl = attn_impl
        self.chunk_steps = chunk_steps
        self.dtype = dtype

        layer_params = params["model"]["layers"]
        other = {k: v for k, v in params["model"].items() if k != "layers"}
        if decode_quant in ("int8", "int8_kv"):
            from spacer_tpu.ops.quant import (
                quantize_dense_int8, quantize_tree_int8)

            layer_params = jax.jit(quantize_tree_int8)(layer_params)
            if "lm_head" in other:
                other = dict(other)
                other["lm_head"] = jax.jit(quantize_dense_int8)(
                    other["lm_head"])
        self.layer_params = layer_params
        self.other_params = other

        tc = cfg.text
        shape = (self.R, self.Pmax + self.Cmax, tc.num_kv_heads, tc.head_dim)
        self.state = {
            "caches": tuple(
                (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
                for _ in range(tc.num_layers)),
            "pmask": jnp.zeros((self.R, self.Pmax), jnp.int32),
            "delta": jnp.zeros((self.R,), jnp.int32),
            "cur": jnp.zeros((self.R,), jnp.int32),
            "t": jnp.zeros((self.R,), jnp.int32),
            "done": jnp.ones((self.R,), bool),   # empty slots read as done
            "maxnew": jnp.zeros((self.R,), jnp.int32),
            "out": jnp.zeros((self.R, self.Cmax), jnp.int32),
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
        assert ids.shape[0] == 1, "one prompt per request"
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

    def _prefill(self, req: dict):
        ids, mask, pos, delta = self._pad_request(req)
        vk = {k: jnp.asarray(v)
              for k, v in (req.get("vision_kwargs") or {}).items()}
        embeds = _prologue_jit(
            self.params, jnp.asarray(ids), vk, cfg=self.cfg,
            grid_thw=req.get("grid_thw"), attn_impl=self.attn_impl,
            family_name=self.family.name,
        ).astype(self.dtype)
        pk, pv, logits = _prefill_jit(
            self.params, embeds, jnp.asarray(pos), jnp.asarray(mask),
            text_cfg=self.cfg.text, attn_impl=self.attn_impl,
        )
        return pk, pv, logits, mask[0], delta

    # -- serving loop ----------------------------------------------------

    def run(self, requests: Sequence[dict],
            max_new_tokens: Optional[int] = None) -> list[ServedOutput]:
        """Drive all requests to completion; returns outputs in order."""
        max_new = int(max_new_tokens or self.Cmax)
        if max_new > self.Cmax:
            raise ValueError(f"max_new {max_new} exceeds bucket {self.Cmax}")
        results: list[Optional[ServedOutput]] = [None] * len(requests)
        queue = deque(enumerate(requests))
        kw = dict(text_cfg=self.cfg.text, temperature=self.temperature,
                  top_p=self.top_p, eos_token_id=self.eos)

        while queue or any(i is not None for i in self._slot_req):
            for r in range(self.R):
                if self._slot_req[r] is None and queue:
                    i, req = queue.popleft()
                    pk, pv, logits, pmask_row, delta = self._prefill(req)
                    self.state = _insert_jit(
                        self.state, pk, pv, logits,
                        jnp.asarray(pmask_row.astype(np.int32)),
                        jnp.int32(delta), jnp.int32(max_new), jnp.int32(r),
                        **kw)
                    self._slot_req[r] = i

            self.state = _chunk_jit(
                self.state, self.layer_params, self.other_params,
                chunk_steps=self.chunk_steps, **kw)

            done = np.asarray(self.state["done"])
            ts = np.asarray(self.state["t"])
            out = np.asarray(self.state["out"])
            for r in range(self.R):
                i = self._slot_req[r]
                if i is not None and bool(done[r]):
                    seq = out[r]
                    cmask = completion_mask_from_ids(seq[None], self.eos)[0]
                    length = int(min(cmask.sum(), ts[r]))
                    results[i] = ServedOutput(sequences=seq, length=length)
                    self._slot_req[r] = None
        return results  # type: ignore[return-value]
