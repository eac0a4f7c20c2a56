"""Inference engines for the eval workers.

QwenEngine is the production path: VLProcessor + the on-mesh KV-cached
sampler over the loaded params (replacing the reference's per-process torch
model + model.generate, e.g. vsibench.py:79-183).  EchoEngine is a test
double so harness plumbing can be exercised without weights.
"""

from __future__ import annotations

from typing import Protocol, Sequence



class InferenceEngine(Protocol):
    def generate(self, messages_list: Sequence[list], *, max_new_tokens: int,
                 temperature: float) -> list[str]: ...


class QwenEngine:
    """Batched multimodal generation on TPU."""

    def __init__(self, cfg, params, processor, attn_impl=None,
                 length_bucket: int = 512, top_p: float = 1.0, seed: int = 0,
                 decode_quant: str | None = None,
                 decode_impl: str | None = None,
                 speculate_k: int = 0):
        from spacer_tpu.sampler import Sampler

        self.cfg = cfg
        self.params = params
        self.processor = processor
        self.top_p = top_p
        self.seed = seed
        # prompt-lookup speculation for generate_many
        # (serving/speculative.py): bit-exact greedy at temperature 0,
        # exact rejection sampling otherwise (outputs then match the
        # sequential sampler in DISTRIBUTION, not token-for-token)
        self.speculate_k = int(speculate_k)
        self._calls = 0
        self._batchers: dict = {}   # geometry key -> ContinuousBatcher
        self.sampler = Sampler(
            cfg,
            eos_token_id=processor.eos_token_id,
            pad_token_id=processor.pad_token_id,
            attn_impl=attn_impl,
            length_bucket=length_bucket,
            decode_quant=decode_quant,
            decode_impl=decode_impl,
        )

    def generate(self, messages_list, *, max_new_tokens: int = 128,
                 temperature: float = 0.01) -> list[str]:
        from spacer_tpu.models.qwen25_vl import get_rope_index

        enc = self.processor.process_messages(
            list(messages_list), add_generation_prompt=True
        )
        pos, deltas = get_rope_index(
            self.cfg,
            enc["input_ids"],
            image_grid_thw=enc.get("image_grid_thw"),
            video_grid_thw=enc.get("video_grid_thw"),
            second_per_grid_ts=enc.get("second_per_grid_ts"),
            attention_mask=enc["attention_mask"],
        )
        # pack both modalities in placeholder appearance order (handles
        # video-only, image-only and mixed batches)
        from spacer_tpu.data.processor import pack_vision_inputs

        pixel_values, grid_thw = pack_vision_inputs(enc)

        self._calls += 1
        out = self.sampler.generate(
            enc["input_ids"], enc["attention_mask"], self.params,
            position_ids=pos, deltas=deltas,
            pixel_values=pixel_values, grid_thw=grid_thw,
            num_generations=1, max_new_tokens=max_new_tokens,
            temperature=temperature, top_p=self.top_p,
            seed=self.seed + self._calls,
        )
        return self.processor.tokenizer.batch_decode(
            [seq[:n] for seq, n in zip(out.sequences, out.lengths)],
            skip_special_tokens=True,
        )

    def generate_many(self, messages_list, *, max_new_tokens: int = 128,
                      temperature: float = 0.01, slots: int = 4,
                      chunk_steps: int = 32,
                      prompt_bucket: int | None = None) -> list[str]:
        """Continuous-batching generation: all prompts stream through a
        fixed set of decode slots (serving/batcher.py) — finished rows
        refill immediately instead of idling until the batch's longest
        answer completes.  Preferred over generate() for large prompt sets
        with variable answer lengths (the six-benchmark eval harness).

        Requests are bucketed by prompt length and each bucket runs in its
        own batcher geometry, so one 16k outlier no longer taxes every
        short prompt with 16k prefill + prefix attention; batchers are
        cached per geometry across calls (no per-wave recompilation)."""
        import numpy as np

        from spacer_tpu.models.registry import encode_request

        # single shared encode path (family-generic positions) — the same
        # helper the HTTP server uses (serving/server.py encode_chat)
        requests = [encode_request(self.processor, self.cfg, m)
                    for m in messages_list]

        bucket = self.sampler.length_bucket

        def pbucket(req):
            if prompt_bucket:
                return prompt_bucket
            n = req["input_ids"].shape[1]
            return max(bucket, -(-n // bucket) * bucket)

        self._calls += 1
        results: list = [None] * len(requests)
        by_bucket: dict[int, list[int]] = {}
        for i, req in enumerate(requests):
            by_bucket.setdefault(pbucket(req), []).append(i)
        for Pmax, idxs in sorted(by_bucket.items()):
            batcher = self._get_batcher(
                Pmax, max_new_tokens, temperature, slots, chunk_steps)
            outs = batcher.run([requests[i] for i in idxs],
                               max_new_tokens=max_new_tokens)
            for i, o in zip(idxs, outs):
                results[i] = o
        return self.processor.tokenizer.batch_decode(
            [np.asarray(o.sequences[:o.length]) for o in results],
            skip_special_tokens=True,
        )

    def _get_batcher(self, Pmax: int, max_new: int, temperature: float,
                     slots: int, chunk_steps: int):
        """Cached per-geometry ContinuousBatcher (avoids the per-wave
        admit/chunk recompile + cache realloc churn of a fresh batcher).
        Cmax is bucketed up so nearby max_new_tokens share a geometry."""
        from spacer_tpu.serving import ContinuousBatcher

        Cmax = max(128, -(-max_new // 128) * 128)
        key = (Pmax, Cmax, round(float(temperature), 6), slots, chunk_steps,
               self.speculate_k)
        if key in self._batchers:
            # LRU touch: with >4 geometries cycling per wave a plain-FIFO
            # eviction would rebuild (KV realloc + recompile) the geometry
            # it is about to reuse on every call
            self._batchers[key] = self._batchers.pop(key)
        else:
            # bound resident KV: drop the least-recently-used beyond 4
            while len(self._batchers) >= 4:
                self._batchers.pop(next(iter(self._batchers)))
            dtype = self.params["model"]["embed_tokens"]["embedding"].dtype
            self._batchers[key] = ContinuousBatcher(
                self.cfg, self.params, slots=slots, prompt_len=Pmax,
                max_new_tokens=Cmax,
                eos_token_id=self.processor.eos_token_id,
                pad_token_id=self.processor.pad_token_id,
                temperature=temperature, top_p=self.top_p,
                attn_impl=self.sampler.attn_impl, chunk_steps=chunk_steps,
                seed=self.seed + self._calls, dtype=dtype,
                decode_quant=self.sampler.decode_quant,
                decode_impl=self.sampler.decode_impl,
                speculate_k=self.speculate_k,
            )
        return self._batchers[key]


class EchoEngine:
    """Deterministic test engine: returns canned or template answers."""

    def __init__(self, responder=None):
        self.responder = responder or (lambda messages: "<answer>A</answer>")
        self.calls: list = []

    def generate(self, messages_list, *, max_new_tokens: int = 128,
                 temperature: float = 0.01) -> list[str]:
        self.calls.append(len(messages_list))
        return [self.responder(m) for m in messages_list]
