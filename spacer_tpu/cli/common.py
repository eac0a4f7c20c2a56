"""Shared CLI plumbing: model/processor loading, mesh setup."""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class ModelArgs:
    model_name_or_path: str = ""       # HF checkpoint dir (safetensors)
    tokenizer_path: str = ""           # defaults to model_name_or_path
    dtype: str = "bfloat16"            # param dtype
    random_init: bool = False          # tiny random model (smoke runs)
    # model family override; empty = dispatch on the model id substring
    # (the reference's "Aria" in model_id rule, grpo_trainer.py:196-205)
    model_family: str = ""
    tp: int = 1                        # tensor-parallel axis size
    fsdp: Optional[int] = None         # fsdp axis size (default: all)
    multihost: bool = False            # call jax.distributed.initialize()
    # decode-path quantization: "" (bf16) | "int8" | "int8_kv"
    # (applies to the sampler AND the continuous-batching engine)
    decode_quant: str = ""
    # decode attention impl: "" (auto) | "xla" | "flash" | "flash_ref"
    # (see Sampler._resolve_decode_impl; applies to both engines)
    decode_impl: str = ""


def setup_distributed(args: ModelArgs):
    if args.multihost:
        import jax

        jax.distributed.initialize()


def load_model_and_processor(args: ModelArgs):
    """Returns (cfg, params, processor, mesh).  Family-dispatched."""
    from spacer_tpu.models.registry import get_family
    from spacer_tpu.parallel import create_mesh, shard_params

    family = get_family(args.model_family or args.model_name_or_path)
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.dtype]
    if args.random_init or not args.model_name_or_path:
        cfg = family.tiny_config()
        params = family.init_params(jax.random.key(0), cfg, dtype)
        if family.name == "aria":
            from spacer_tpu.data.aria_processor import MockAriaTokenizer

            tokenizer = MockAriaTokenizer(vocab_size=cfg.text.vocab_size)
        else:
            from spacer_tpu.data.processor import MockTokenizer

            tokenizer = MockTokenizer(vocab_size=cfg.text.vocab_size)
    else:
        params, cfg = family.load_params_from_hf(
            args.model_name_or_path, dtype=dtype
        )
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(
            args.tokenizer_path or args.model_name_or_path
        )
    processor = family.make_processor(tokenizer, cfg)

    mesh = None
    if len(jax.devices()) > 1:
        from spacer_tpu.parallel import mesh_shape_for

        shape = mesh_shape_for(
            len(jax.devices()), tp=args.tp, fsdp=args.fsdp
        )
        mesh = create_mesh(shape)
        params, _ = shard_params(params, mesh, family.partition_rules)
    return cfg, params, processor, mesh
