"""SG-RLVR trainer: rollout -> rewards -> advantages -> SPMD update.

Behavioral reference: SG_RLVR_trainer.py compute_loss (:384-686) and the HF
Trainer loop around it.  Differences by design (TPU-first):
- no vLLM/dedicated GPU: the sampler shares params with the train step.
- vision encoded once per prompt; embeddings broadcast across the G
  completions (reference tiles pixels xG, :516-518).
- temporal-shuffle rollouts use G/2 generations like the reference
  (:277-302); no ZeRO-3 dummy-generate lockstep is needed because there is
  no cross-process collective to deadlock (:479-481 is obsolete on SPMD).
- second_per_grid_ts: with the training fps of 2.0 it equals 1.0, which is
  exactly what the reference's deletion of the key falls back to
  (:519-521), so positions match the reference bit-for-bit.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from collections import defaultdict
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spacer_tpu.models.qwen25_vl.config import Qwen25VLConfig
from spacer_tpu.sampler import Sampler
from spacer_tpu.train.grpo import (
    group_advantages,
    length_control_bonus,
    temporal_bonus,
)
from spacer_tpu.train.optimizer import make_optimizer
from spacer_tpu.train.step import make_grpo_train_step
from spacer_tpu.utils.logging import MetricLogger


def _concat_maybe_device(parts):
    """Concatenate pixel chunks WITHOUT pulling prefetched device arrays
    back to host (np.concatenate on a jax.Array would re-transfer)."""
    if any(isinstance(p, jax.Array) for p in parts):
        return jnp.concatenate([jnp.asarray(p) for p in parts], axis=0)
    return np.concatenate(parts).astype(np.float32)


def _device_prefetch_vision(enc: dict, cast=None) -> dict:
    """Start the host->device transfer of the big pixel arrays NOW.

    Called from the prefetch thread pool, so the transfer (the slowest
    fixed cost of a step on tunneled/relayed backends: tens of MB per
    video at ~55 MB/s here) fully overlaps the previous training step.
    `cast=jnp.bfloat16` ships float pixels as bf16 — when the patch-embed
    matmul runs in bf16 params this matches the on-device cast at HALF the
    wire bytes; under f32 params (parity/debug runs) the caller passes
    cast=None so input precision is preserved.
    """
    # multi-process: pixels must stay host numpy — the per-host encodings
    # are exchanged via all_gather_objects (pickle) before placement, and
    # the global placement happens once in Sampler._to_device
    put = jax.process_count() == 1
    for k in ("pixel_values", "pixel_values_videos"):
        if k in enc and not isinstance(enc[k], jax.Array):
            arr = np.asarray(enc[k])
            if cast is not None and arr.dtype in (np.float32, np.float64):
                arr = arr.astype(cast)
            enc[k] = jax.device_put(arr) if put else arr
    return enc


@dataclasses.dataclass
class SGRLVRConfig:
    """Training hyperparameters (defaults = run_SpaceR_SG_RLVR.sh:15-39)."""

    num_generations: int = 8
    # prompts (groups) per optimizer step. The reference's global batch is 8
    # prompts/step (8 procs x per_device_train_batch_size 1,
    # run_SpaceR_SG_RLVR.sh:9,21); one SPMD process covers the whole mesh, so
    # the equivalent setting here is rollout_batch_size=8 on an 8-chip mesh.
    rollout_batch_size: int = 1
    max_prompt_length: int = 16384
    max_completion_length: int = 1024
    learning_rate: float = 1e-6
    weight_decay: float = 0.01
    max_grad_norm: float = 5.0
    beta: float = 0.04
    temperature: float = 1.0
    top_p: float = 0.95
    temporal: bool = True
    len_control: bool = True
    # decode the temporal-shuffle rollout in the SAME grouped program as the
    # main rollout (decode is weight-bandwidth-bound: the merged decode pays
    # max(len) weight passes instead of len_main + len_shuffled)
    merge_temporal_rollout: bool = True
    # NOTE: a live-row-compaction rollout scheduler (rows that hit EOS stop
    # paying tail-KV/flops) was built, measured on v5e at the bench
    # geometry, and RETIRED in round 5: the recovered time was only a few
    # percent (tail reads scale with the BUCKET, not the live depth, and
    # width-shrink duplicates prefix slots), so the flag was a trap.  The
    # measurement survives as bench.py bench_rollout_waste; the scheduling
    # win that ships is merge_temporal_rollout.
    num_train_epochs: int = 1
    max_steps: int | None = None
    gradient_accumulation_steps: int = 1
    logging_steps: int = 1
    save_steps: int = 1000
    save_only_model: bool = False  # run_SpaceR_SG_RLVR.sh:38
    skip_failed_steps: bool = True
    output_dir: str = "output"
    seed: int = 42
    min_pixels: int = 3136
    max_pixels: int = 401408
    prompt_bucket: int = 512
    # keep Adam moments in pinned HOST memory between steps (the ZeRO-3
    # CPU-offload equivalent, local_scripts/zero3_offload.json): frees
    # 2x(param bytes) of steady-state HBM for rollout KV caches at the cost
    # of streaming the moments across PCIe around each update
    offload_opt_state: bool = False
    # Adam moment storage (train/optimizer.py): "int8" (DEFAULT) =
    # blockwise-quantized moments (~2.6 bytes/param), the bitsandbytes
    # 8-bit-Adam role — the memory lever that fits 7B training
    # (configs/sg_rlvr_7b.yaml) and the bench headline configuration;
    # backed by the 3-seed RL-quality A/B (tools/ab_moments.json: reward
    # delta 0.0012 vs f32 seed-to-seed spread 0.021, KL delta 0.018 vs
    # spread 0.217 — INDISTINGUISHABLE).  "float32" = the reference
    # torch.optim.AdamW behavior (8 bytes/param of state), exact-parity
    # opt-in.
    moment_dtype: str = "int8"
    remat: bool = True
    logp_chunk: int = 256
    attn_impl: Optional[str] = None
    warmup_steps: int = 0
    # rollout decode quantization (ops/quant.py): "int8" = weight-only;
    # "int8_kv" = int8 weights + int8 KV caches (halves the per-step cache
    # reads too); None = bf16.  logps/updates always stay bf16 — only the
    # sampling distribution is perturbed (~0.5% RMS logits).  A 5-seed
    # RL-quality A/B (tools/ab_rollout_quant.json, 50-step GRPO per arm:
    # reward delta 0.0045 vs bf16 seed-to-seed spread 0.036, KL delta
    # 0.0039 vs spread 0.284 — INDISTINGUISHABLE) backs int8_kv as the
    # shipped default (the bench headline configuration).  The A/B reward
    # is synthetic (tiny random-init model); a realistic-reward rerun
    # needs a mounted checkpoint — the trainer prints a one-line notice
    # at init whenever rollouts are quantized, and decode_quant=None
    # restores the reference's exact bf16 rollout numerics.
    decode_quant: Optional[str] = "int8_kv"
    # rollout decode attention impl: None (auto) | "xla" | "flash" |
    # "flash_ref" (Sampler._resolve_decode_impl)
    decode_impl: Optional[str] = None
    # publish the final model to the HF Hub after save (SG-RLVR.py:384-386)
    push_to_hub: bool = False
    hub_model_id: str = ""
    # prompt-lookup speculative rollout decode (sampler/speculating.py):
    # verify 1 + k tokens per block step — exact (greedy bit-exact;
    # sampled matches the sequential distribution).  0 = off.  The win is
    # proportional to draft acceptance, which depends on how self-
    # referential the model's completions are — enable for real
    # checkpoints (CoT traces quote the question/options heavily); see
    # spec_acceptance in the trainer metrics for the live rate.
    speculate_k: int = 0


class SGRLVRTrainer:
    """Single-controller SPMD trainer (one python process per host)."""

    def __init__(
        self,
        cfg: Qwen25VLConfig,
        params,
        processor,
        reward_funcs: Sequence[Callable],
        train_dataset: Sequence[dict],
        args: SGRLVRConfig,
        *,
        map_data: dict | None = None,
        ref_params=None,
        mesh=None,
    ):
        from spacer_tpu.models.registry import family_for_config

        self.cfg = cfg
        self.family = family_for_config(cfg)
        self.args = args
        self.processor = processor
        self.reward_funcs = list(reward_funcs)
        self.dataset = list(train_dataset)
        self.map_data = map_data
        self.mesh = mesh

        self.params = params
        # beta == 0 means no KL term: never materialize a reference copy
        # (TRL GRPO's beta=0 loads no ref model; at 7B the copy is 16.6GB)
        self.ref_params = (
            ref_params if ref_params is not None
            else None if args.beta == 0.0
            else jax.tree.map(jnp.copy, params)
        )
        # pixel wire dtype: ship bf16 only when the patch embed actually
        # runs in bf16 params (otherwise the cast would silently degrade
        # vision input precision on f32 parity/debug runs).  Infer from the
        # VISION tower (both families root it at params["visual"]) — a
        # mixed-precision checkpoint (bf16 LM + f32 vision or vice versa)
        # must not take its wire dtype from an unrelated LM leaf.
        vis_tree = params.get("visual", params) if isinstance(params, dict) \
            else params
        embed_dtype = jax.tree_util.tree_leaves(vis_tree)[0].dtype
        self._pixel_cast = (
            jnp.bfloat16 if embed_dtype == jnp.bfloat16 else None
        )

        steps_per_epoch = -(-len(self.dataset)
                            // max(1, args.rollout_batch_size))
        total = args.max_steps or (args.num_train_epochs * steps_per_epoch)
        self.tx = make_optimizer(
            learning_rate=args.learning_rate,
            total_steps=total,
            warmup_steps=args.warmup_steps,
            weight_decay=args.weight_decay,
            max_grad_norm=args.max_grad_norm,
            moment_dtype=args.moment_dtype,
        )
        if args.gradient_accumulation_steps > 1:
            import optax

            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=args.gradient_accumulation_steps
            )
        self.opt_state = self.tx.init(self.params)
        if args.offload_opt_state:
            from spacer_tpu.parallel.offload import offload_to_host

            self.opt_state = offload_to_host(self.opt_state)
        if args.decode_quant:
            # one-line visibility notice (ADVICE r4): the rollout SAMPLING
            # distribution is quantized (~0.5% RMS logit perturbation);
            # logps and updates stay bf16.  Backed by the multi-seed A/B in
            # tools/ab_rollout_quant.json (synthetic reward; re-run with a
            # real checkpoint when one is mounted).  decode_quant=None
            # restores the reference's exact bf16 rollout numerics.
            print(f"[spacer] rollout decode quantized: "
                  f"decode_quant={args.decode_quant!r} "
                  f"(sampling-distribution change; set decode_quant=None "
                  f"for bf16-exact rollouts)", flush=True)
        self.sampler = Sampler(
            cfg,
            eos_token_id=processor.eos_token_id,
            pad_token_id=processor.pad_token_id,
            attn_impl=args.attn_impl,
            length_bucket=args.prompt_bucket,
            decode_quant=args.decode_quant,
            decode_impl=args.decode_impl,
            speculate_k=args.speculate_k,
            mesh=mesh,
        )
        self.step_fn = make_grpo_train_step(
            cfg, self.tx, beta=args.beta, remat=args.remat,
            attn_impl=args.attn_impl, logp_chunk=args.logp_chunk,
        )
        self.global_step = 0
        self._metrics = defaultdict(list)
        self.logger = MetricLogger(args.output_dir)

    # -- data prep ------------------------------------------------------

    def _prepare_inputs(self, row: dict, shuffle_frames: bool = False,
                        rng: np.random.Generator | None = None):
        """Row -> (processor outputs, prompt text).  Injects the media path
        into the first content element (SG_RLVR_trainer.py:396-414)."""
        import copy

        prompt = copy.deepcopy(row["prompt"])
        for msg in prompt:
            if isinstance(msg.get("content"), list):
                for ele in msg["content"]:
                    for k in [k for k, v in ele.items() if v is None]:
                        del ele[k]
        if row["data_type"] == "image":
            prompt[0]["content"][0]["image"] = row["path"]
        elif row["data_type"] == "video":
            prompt[0]["content"][0]["video"] = row["path"]

        if self.family.name == "aria":
            # Aria is image-only (reference grpo_trainer.py Aria branch);
            # the AriaProcessor handles fetch + crop geometry itself.
            out = self.processor.process_messages([prompt])
            return _device_prefetch_vision(out, self._pixel_cast), False

        from spacer_tpu.vision.process import process_vision_info

        for msg in prompt:
            if isinstance(msg.get("content"), list):
                for ele in msg["content"]:
                    if "video" in ele or "image" in ele:
                        ele.setdefault("min_pixels", self.args.min_pixels)
                        ele.setdefault("max_pixels", self.args.max_pixels)
        images, videos, vkw = process_vision_info(
            [prompt], return_video_kwargs=True
        )
        if shuffle_frames and videos:
            perm = rng.permutation(videos[0].shape[0])
            videos = [videos[0][perm]]
        text = self.processor.apply_chat_template(
            prompt, add_generation_prompt=True
        )
        out = self.processor(
            [text], images=images, videos=videos, fps=vkw.get("fps"),
        )
        return (
            _device_prefetch_vision(out, self._pixel_cast),
            videos is not None and len(videos) > 0,
        )

    def _truncate_prompt(self, enc: dict):
        mp = self.args.max_prompt_length
        enc["input_ids"] = enc["input_ids"][:, -mp:]
        enc["attention_mask"] = enc["attention_mask"][:, -mp:]
        return enc

    def _collate(self, encs: list[dict]) -> dict:
        """B single-row processor outputs -> one batch dict.

        Prompts are left-padded to the common max length (the reference gets
        this from processor(padding_side='left'), SG_RLVR_trainer.py:417-430);
        media patches/grids concatenate in row order, which is exactly the
        batch-major order merge_vision_embeds scatters in.
        """
        pad_id = self.processor.pad_token_id
        L = max(e["input_ids"].shape[1] for e in encs)
        ids, mask = [], []
        for e in encs:
            p = L - e["input_ids"].shape[1]
            ids.append(np.pad(e["input_ids"], ((0, 0), (p, 0)),
                              constant_values=pad_id))
            mask.append(np.pad(e["attention_mask"], ((0, 0), (p, 0))))
        out = {
            "input_ids": np.concatenate(ids),
            "attention_mask": np.concatenate(mask),
        }
        if self.family.name == "aria":
            counts = []
            pix, pmask, ppos = [], [], []
            for e in encs:
                n = e["pixel_values"].shape[0] if "pixel_values" in e else 0
                counts.append(n)
                if n:
                    pix.append(e["pixel_values"])
                    pmask.append(e["patch_mask"])
                    ppos.append(e["pixel_position_ids"])
            if pix:
                out["pixel_values"] = _concat_maybe_device(pix)
                out["patch_mask"] = np.concatenate(pmask)
                out["pixel_position_ids"] = np.concatenate(ppos)
            out["grids_per_prompt"] = tuple(counts)
            return out
        from spacer_tpu.data.processor import pack_vision_inputs

        pixels, vgrids, igrids, spgt, counts, allg = [], [], [], [], [], []
        for e in encs:
            # per-row pack in placeholder appearance order (mixed media ok)
            px, grids = pack_vision_inputs(e)
            n = 0
            if px is not None:
                pixels.append(px)
                allg.extend(grids)
                n = len(grids)
            if "video_grid_thw" in e:
                vgrids.append(np.asarray(e["video_grid_thw"]))
                ts = e.get("second_per_grid_ts")
                spgt.extend(
                    list(ts) if ts is not None
                    else [1.0] * len(e["video_grid_thw"])
                )
            if "image_grid_thw" in e:
                igrids.append(np.asarray(e["image_grid_thw"]))
            counts.append(n)
        if pixels:
            out["pixel_values"] = _concat_maybe_device(pixels)
            # flat grids in row order (ViT packs all media in one call)
            out["grid_thw"] = tuple(tuple(int(x) for x in g) for g in allg)
            if vgrids:
                out["video_grid_thw"] = np.concatenate(vgrids)
                out["second_per_grid_ts"] = spgt
            if igrids:
                out["image_grid_thw"] = np.concatenate(igrids)
        out["grids_per_prompt"] = tuple(counts)
        return out

    def _positions(self, enc: dict):
        return self.family.positions(
            self.cfg, enc["input_ids"], enc["attention_mask"], enc
        )

    # -- one training step ---------------------------------------------

    def _place(self, batch: dict) -> dict:
        """Explicit mesh placement of a host batch of LOCAL rows: each host
        contributes its slice of the global batch (multi-host aware)."""
        if self.mesh is None:
            return batch
        if jax.process_count() > 1:
            from spacer_tpu.parallel.multihost import global_batch_from_local

            return global_batch_from_local(batch, self.mesh)
        from spacer_tpu.parallel import place_batch

        return place_batch(batch, self.mesh)

    def _place_global(self, batch: dict) -> dict:
        """Mesh placement of a host batch that is already GLOBAL (identical
        on every host — training_step gathers the encodings up front)."""
        if self.mesh is None:
            return batch
        from spacer_tpu.parallel.multihost import place_global_batch

        return place_global_batch(batch, self.mesh)

    def training_step(self, rows, rng: np.random.Generator, prepared=None):
        """One optimizer step over B = len(rows) prompt-groups.

        B=1 matches one reference process; B=8 matches the reference's
        8-process global step (run_SpaceR_SG_RLVR.sh:9,21). Advantages stay
        per-group (SG_RLVR_trainer.py:632-638); temporal/length bonuses apply
        per group, which at B=1 is exactly the reference's per-process batch.
        """
        args = self.args
        G = args.num_generations
        if isinstance(rows, dict):
            rows = [rows]
        if prepared is not None and not isinstance(prepared, list):
            prepared = [prepared]
        B = len(rows)
        t_start = time.perf_counter()

        preps = prepared if prepared is not None else [
            self._prepare_inputs(r) for r in rows
        ]
        encs = [self._truncate_prompt(p[0]) for p in preps]
        has_video = [p[1] for p in preps]

        # Temporal-shuffle prompts are prepared BEFORE the main rollout so
        # both can decode in ONE grouped program (merge_temporal_rollout):
        # decode is weight-bandwidth-bound, so the shuffled rollout rides
        # the SAME per-step weight reads as the main one — two sequential
        # decodes pay max_len_main + max_len_shuffled weight passes, the
        # merged decode pays max over all rows (up to 2x fewer).  The
        # shuffled groups decode G rows like the main ones (uniform group
        # size keeps the shared-prefix layout); only the first G/2 are kept
        # (SG_RLVR_trainer.py:277-302 uses G/2 shuffled generations) — the
        # extra rows are marginal-cost in a weight-bound decode.  They are
        # also prepared before the multi-host gather so ONE exchange
        # carries main and shuffled encodings together.
        s_encs = []
        if args.temporal:
            for b in [b for b in range(B) if has_video[b]]:
                s_enc, _ = self._prepare_inputs(
                    rows[b], shuffle_frames=True, rng=rng
                )
                s_encs.append(self._truncate_prompt(s_enc))

        # --- multi-host: exchange per-host encodings so every host holds
        # the IDENTICAL global batch.  Single-controller SPMD: the params
        # are sharded over the GLOBAL mesh, so the rollout and update are
        # one global program every host must enter with the same data —
        # unlike the reference, where each torchrun process rolls out on
        # its own GPU and only gradients sync (run_SpaceR_SG_RLVR.sh:9-13).
        # The expensive host work stays distributed: each host decodes the
        # videos and scores the rewards of ITS OWN rows only, and the
        # rollout DEVICE compute is batch-sharded over the data axis
        # (Sampler._rollout_spec), so decode throughput scales with hosts.
        # SCALING CEILING (documented per ADVICE r4): this exchange pickles
        # each host's packed pixel patches to every other host — DCN bytes
        # and host memory grow O(num_hosts x global_batch x patches) per
        # step (~9MB/video at the training budget, bf16).  At the
        # reference scale (8 ranks, 1 video each) that is ~72MB/step/host
        # — trivially amortized by the prefetch thread; revisit with
        # per-host-addressable pixel shards
        # (make_array_from_process_local_data) only if rollout batches
        # grow to hundreds of videos across tens of hosts.
        nproc = jax.process_count()
        B_local, row_off = B, 0
        if nproc > 1:
            from spacer_tpu.parallel import multihost

            gathered = multihost.all_gather_objects(
                (encs, s_encs, has_video))
            rank = jax.process_index()
            row_off = int(sum(len(g[0]) for g in gathered[:rank]))
            encs = [e for g in gathered for e in g[0]]
            s_encs = [e for g in gathered for e in g[1]]
            has_video = [h for g in gathered for h in g[2]]
            B = len(encs)

        def _rollout_seed() -> int:
            s = int(rng.integers(2**31))
            if nproc > 1:
                from spacer_tpu.parallel.multihost import (
                    broadcast_from_host0,
                )

                return int(broadcast_from_host0(s))
            return s

        enc = self._collate(encs)
        pos, deltas = self._positions(enc)
        grid_thw = enc.get("grid_thw")
        grids_per_prompt = enc["grids_per_prompt"]
        vision_kwargs = {
            k: enc[k] for k in self.family.vision_batch_keys if k in enc
        } or None

        video_idx = [b for b in range(B) if has_video[b]]
        do_temporal = args.temporal and bool(video_idx)
        merge_shuffled = do_temporal and args.merge_temporal_rollout

        s_out = None
        if merge_shuffled:
            from spacer_tpu.sampler.sampler import SampleOutput

            all_col = self._collate(encs + s_encs)
            a_pos, a_deltas = self._positions(all_col)
            a_vk = {
                k: all_col[k] for k in self.family.vision_batch_keys
                if k in all_col
            } or None
            out_all = self.sampler.generate(
                all_col["input_ids"], all_col["attention_mask"], self.params,
                position_ids=a_pos, deltas=a_deltas,
                vision_kwargs=a_vk, grid_thw=all_col.get("grid_thw"),
                num_generations=G,
                max_new_tokens=args.max_completion_length,
                temperature=args.temperature, top_p=args.top_p,
                seed=_rollout_seed(),
            )
            n_main = B * G
            sample_out = SampleOutput(
                sequences=out_all.sequences[:n_main],
                completion_mask=out_all.completion_mask[:n_main],
                lengths=out_all.lengths[:n_main],
                stats=out_all.stats,
            )
            s_out = SampleOutput(
                sequences=out_all.sequences[n_main:],
                completion_mask=out_all.completion_mask[n_main:],
                lengths=out_all.lengths[n_main:],
            )
        else:
            sample_out = self.sampler.generate(
                enc["input_ids"], enc["attention_mask"], self.params,
                position_ids=pos, deltas=deltas,
                vision_kwargs=vision_kwargs, grid_thw=grid_thw,
                num_generations=G,
                max_new_tokens=args.max_completion_length,
                temperature=args.temperature, top_p=args.top_p,
                seed=_rollout_seed(),
            )
        # decode ONLY the rows this host owns (its reward work share)
        lsl = slice(row_off * G, (row_off + B_local) * G)
        completions = self.processor.tokenizer.batch_decode(
            [seq[:n] for seq, n in
             zip(sample_out.sequences[lsl], sample_out.lengths[lsl])],
            skip_special_tokens=True,
        )
        from spacer_tpu.utils.logging import debug_trace

        debug_trace(
            "rollout", step=self.global_step,
            path=[r.get("path") for r in rows],
            problem_id=[r.get("problem_id") for r in rows],
            completions="\n---\n".join(completions),
        )
        t_rollout = time.perf_counter()

        # --- build the (advantage-free) train batch now so the reference
        # forward can run asynchronously UNDER the host-side reward loop.
        # Shared-prefix schema (step.py _completion_logps_shared): the
        # prompt forward runs once per group, its KV reused by the G
        # completion rows — same math as the packed full forward (parity-
        # pinned in tests/test_train_step.py) at ~(P/G + C)/(P + C) of the
        # flops.
        P_len = enc["input_ids"].shape[1]
        Pb = self.sampler._bucket(P_len)
        pad = Pb - P_len
        prompt_ids_p = np.pad(
            enc["input_ids"], ((0, 0), (pad, 0)),
            constant_values=self.processor.pad_token_id,
        )
        prompt_mask_p = np.pad(enc["attention_mask"], ((0, 0), (pad, 0)))
        pos_p = np.pad(pos, ((0, 0), (0, 0), (pad, 0)), constant_values=1)
        C = args.max_completion_length
        comp_mask = sample_out.completion_mask
        comp_pos = (deltas.reshape(-1, 1) - pad) + Pb + np.arange(C)[None, :]
        comp_pos = np.repeat(comp_pos, G, axis=0)  # (B*G, C)
        batch = {
            "prompt_ids": prompt_ids_p.astype(np.int32),
            "prompt_mask": prompt_mask_p.astype(np.int32),
            "prompt_position_ids": pos_p.astype(np.int32),
            "completion_ids": sample_out.sequences.astype(np.int32),
            "completion_position_ids": np.broadcast_to(
                comp_pos[None], (3, B * G, C)).astype(np.int32),
            "completion_mask": comp_mask.astype(np.int32),
        }
        if vision_kwargs is not None:
            for k, v in vision_kwargs.items():
                # keep prefetched device arrays on device (np.asarray on a
                # jax.Array would round-trip the pixels through the host)
                batch[k] = v if isinstance(v, jax.Array) else np.asarray(v)
        batch = self._place_global(batch)
        # async dispatch: overlaps with the reward python below
        ref_logps = self.step_fn.ref_logps_fn(
            self.ref_params, batch, grid_thw, G, Pb, grids_per_prompt
        )

        # temporal-shuffle rewards (G/2 generations per video row,
        # SG_RLVR_trainer.py:554-572)
        shuffled_rewards = {}
        if do_temporal:
            Gs = G // 2
            if merge_shuffled:
                # s_out holds G rows per shuffled prompt; keep the first Gs
                keep = np.concatenate([
                    np.arange(j * G, j * G + Gs)
                    for j in range(len(video_idx))
                ])
                s_seqs = s_out.sequences[keep]
                s_lens = s_out.lengths[keep]
            else:
                s_col = self._collate(s_encs)
                s_pos, s_deltas = self._positions(s_col)
                s_vk = {
                    k: s_col[k] for k in self.family.vision_batch_keys
                    if k in s_col
                } or None
                s_sep = self.sampler.generate(
                    s_col["input_ids"], s_col["attention_mask"], self.params,
                    position_ids=s_pos, deltas=s_deltas,
                    vision_kwargs=s_vk,
                    grid_thw=s_col.get("grid_thw"),
                    num_generations=Gs,
                    max_new_tokens=args.max_completion_length,
                    temperature=args.temperature, top_p=args.top_p,
                    seed=_rollout_seed(),
                )
                s_seqs = s_sep.sequences
                s_lens = s_sep.lengths
            # score only the shuffled rollouts of the videos this host owns
            for j, b in enumerate(video_idx):
                if not (row_off <= b < row_off + B_local):
                    continue
                s_comp = self.processor.tokenizer.batch_decode(
                    [seq[:n] for seq, n in
                     zip(s_seqs[j * Gs:(j + 1) * Gs],
                         s_lens[j * Gs:(j + 1) * Gs])],
                    skip_special_tokens=True,
                )
                shuffled_rewards[b] = self._compute_rewards(
                    rows[b - row_off], s_comp
                )

        rewards_per_func = np.concatenate([
            self._compute_rewards(rows[j], completions[j * G : (j + 1) * G])
            for j in range(B_local)
        ])
        if nproc > 1:
            # one exchange carries the main AND shuffled local rewards
            from spacer_tpu.parallel import multihost

            parts = multihost.all_gather_objects(
                (rewards_per_func, shuffled_rewards))
            rewards_per_func = np.concatenate([p[0] for p in parts])
            shuffled_rewards = {}
            for p in parts:
                shuffled_rewards.update(p[1])

        temporal_flags = []
        rewards = np.zeros(B * G, np.float32)
        for b in range(B):
            sl = slice(b * G, (b + 1) * G)
            rpf = rewards_per_func[sl]
            if args.temporal and b in shuffled_rewards:
                rpf, flag = temporal_bonus(rpf, shuffled_rewards[b])
                rewards_per_func[sl] = rpf
                temporal_flags.append(flag)
            r = rpf.sum(axis=1)
            if args.len_control:
                r = length_control_bonus(
                    r, rpf[:, 0], sample_out.lengths[sl]
                )
            rewards[sl] = r
        advantages = np.asarray(group_advantages(jnp.asarray(rewards), G))
        t_reward = time.perf_counter()

        batch.update(self._place_global({
            "advantages": advantages.astype(np.float32)
        }))
        batch["ref_logps"] = ref_logps  # dispatched earlier, likely done
        opt_state = self.opt_state
        if args.offload_opt_state:
            from spacer_tpu.parallel.offload import to_device

            opt_state = to_device(opt_state)  # async H2D for the update
        self.params, opt_state, metrics = self.step_fn(
            self.params, self.ref_params, opt_state, batch,
            grid_thw=grid_thw, num_generations=G, prompt_len=Pb,
            grids_per_prompt=grids_per_prompt,
        )
        if args.offload_opt_state:
            from spacer_tpu.parallel.offload import offload_to_host

            # moments leave HBM again until the next update (async transfer;
            # the next rollout overlaps it)
            opt_state = offload_to_host(opt_state)
        self.opt_state = opt_state
        t_update = time.perf_counter()

        # --- metrics (SG_RLVR_trainer.py:650-683 equivalents)
        m = self._metrics
        m["completion_length"].append(float(sample_out.lengths.mean()))
        for i, fn in enumerate(self.reward_funcs):
            m[f"rewards/{getattr(fn, '__name__', f'reward_{i}')}"].append(
                float(rewards_per_func[:, i].mean())
            )
        group = rewards.reshape(-1, G)
        m["all_wrong"].append(float((group <= 1).all(axis=1).mean()))
        m["all_correct"].append(float((group >= 2).all(axis=1).mean()))
        if args.temporal:
            m["temporal_rewards"].append(
                float(np.mean(temporal_flags)) if temporal_flags else 0.5
            )
        m["reward"].append(float(rewards.mean()))
        m["reward_std"].append(float(group.std(axis=1, ddof=1).mean()))
        if sample_out.stats and "spec_acceptance" in sample_out.stats:
            m["spec_acceptance"].append(sample_out.stats["spec_acceptance"])
        m["kl"].append(float(metrics["kl"]))
        m["loss"].append(float(metrics["loss"]))
        m["grad_norm"].append(float(metrics["grad_norm"]))
        m["time/rollout_s"].append(t_rollout - t_start)
        m["time/reward_s"].append(t_reward - t_rollout)
        m["time/update_s"].append(t_update - t_reward)
        return metrics

    def _compute_rewards(self, row: dict, completions: list[str]) -> np.ndarray:
        n = len(completions)
        out = np.zeros((n, len(self.reward_funcs)), np.float32)
        reward_kwargs = {
            k: [row[k]] * n for k in row.keys()
            if k not in ("prompt", "completion")
        }
        comps = [[{"content": c}] for c in completions]
        for i, fn in enumerate(self.reward_funcs):
            kwargs = dict(reward_kwargs)
            # explicit registry flag, NOT a __name__ check: a wrapped or
            # renamed reward fn keeps receiving map_data as long as it
            # carries the attribute (rewards/accuracy.py sets it)
            if getattr(fn, "needs_map_data", False):
                kwargs["map_data"] = self.map_data
            vals = fn(
                completions=comps,
                solution=reward_kwargs.get("solution", [""] * n),
                **{k: v for k, v in kwargs.items() if k != "solution"},
            )
            out[:, i] = np.asarray(vals, np.float32)
        return out

    # -- loop ------------------------------------------------------------

    def train(self, resume_from_checkpoint: str | None = None):
        args = self.args
        if resume_from_checkpoint:
            self.load_checkpoint(resume_from_checkpoint)
        # epoch order is a pure function of the seed, so resume recovers the
        # dataloader position from global_step alone
        rng = np.random.default_rng(args.seed)
        B = max(1, args.rollout_batch_size)
        steps_per_epoch = -(-len(self.dataset) // B)
        total = args.max_steps or (steps_per_epoch * args.num_train_epochs)
        start_epoch = self.global_step // steps_per_epoch
        from concurrent.futures import ThreadPoolExecutor

        # Host-side prefetch: decode+preprocess the NEXT chunk's videos while
        # the current step trains (the reference decodes synchronously every
        # step — SURVEY.md §3.1 hot loop (c)).
        prefetch = ThreadPoolExecutor(max_workers=min(4, B + 1))

        for epoch in range(args.num_train_epochs):
            order = np.random.default_rng(args.seed + epoch).permutation(
                len(self.dataset)
            )
            if epoch < start_epoch:
                continue
            chunks = [order[i : i + B] for i in range(0, len(order), B)]
            skip = (
                self.global_step % steps_per_epoch
                if epoch == start_epoch else 0
            )

            def submit(ci):
                if ci >= len(chunks):
                    return None
                return [
                    prefetch.submit(self._prepare_inputs, self.dataset[int(j)])
                    for j in chunks[ci]
                ]

            pending = submit(skip)
            for ci in range(skip, len(chunks)):
                if self.global_step >= total:
                    prefetch.shutdown(wait=False)
                    return
                chunk_rows = [self.dataset[int(j)] for j in chunks[ci]]
                try:
                    prepared = (
                        [f.result() for f in pending]
                        if pending is not None else None
                    )
                except Exception:
                    prepared = None
                pending = submit(ci + 1)
                try:
                    self.training_step(chunk_rows, rng, prepared=prepared)
                except Exception as e:
                    # degrade instead of crashing (the reference absorbs
                    # failures via its try/except fallbacks, SURVEY.md §4)
                    self.logger.log_event(
                        {"step": self.global_step, "error": repr(e),
                         "problem_id": [
                             r.get("problem_id") for r in chunk_rows
                         ]}
                    )
                    if not self.args.skip_failed_steps:
                        raise
                    continue
                self.global_step += 1
                if self.global_step % args.logging_steps == 0:
                    self._flush_metrics()
                if self.global_step % args.save_steps == 0:
                    self.save_checkpoint()
        prefetch.shutdown(wait=False)

    def _flush_metrics(self):
        avg = {k: sum(v) / len(v) for k, v in self._metrics.items() if v}
        avg["step"] = self.global_step
        self.logger.log_metrics(avg)
        self._metrics.clear()

    # -- checkpointing ----------------------------------------------------

    def save_checkpoint(self, path: str | None = None):
        from spacer_tpu.train.checkpoint import (
            save_model_only,
            save_train_state,
        )

        path = path or os.path.join(
            self.args.output_dir, f"checkpoint-{self.global_step}"
        )
        if self.args.save_only_model:
            return save_model_only(path, self.params)
        save_train_state(
            path, self.params, self.opt_state,
            {"global_step": self.global_step},
        )
        return path

    def save_pretrained(self, out_dir: str | None = None,
                        processor_dir: str | None = None):
        """HF-layout export (model.safetensors + config.json + processor
        files) and optional Hub publish — the trainer.save_model +
        push_to_hub endgame of SG-RLVR.py:383-386 / sft.py:260-266."""
        from spacer_tpu.train import publish

        out_dir = out_dir or os.path.join(self.args.output_dir, "final")
        if self.args.push_to_hub and not self.args.hub_model_id:
            # fail BEFORE the (slow) export: a basename fallback would
            # publish to a repo literally named "final"
            raise ValueError(
                "push_to_hub=True requires hub_model_id (the Hub repo id); "
                "refusing to invent one from the output directory name")
        publish.save_pretrained(out_dir, self.params, self.cfg,
                                processor_dir=processor_dir)
        if self.args.push_to_hub:
            publish.push_to_hub(self.args.hub_model_id, out_dir)
        return out_dir

    def load_checkpoint(self, path: str):
        from spacer_tpu.train.checkpoint import restore_train_state

        self.params, self.opt_state, meta = restore_train_state(
            path, self.params, self.opt_state
        )
        self.global_step = int(meta.get("global_step", 0))
