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
    tp: int = 1                        # tensor-parallel axis size
    fsdp: Optional[int] = None         # fsdp axis size (default: all)
    multihost: bool = False            # call jax.distributed.initialize()


def setup_distributed(args: ModelArgs):
    if args.multihost:
        import jax

        jax.distributed.initialize()


def load_model_and_processor(args: ModelArgs):
    """Returns (cfg, params, processor, mesh)."""
    from spacer_tpu.data.processor import MockTokenizer, VLProcessor
    from spacer_tpu.models.qwen25_vl import (
        Qwen25VLConfig, init_params, load_params_from_hf, tiny_config,
    )
    from spacer_tpu.parallel import create_mesh, shard_params

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.dtype]
    if args.random_init or not args.model_name_or_path:
        cfg = tiny_config()
        params = init_params(jax.random.key(0), cfg, dtype)
        tokenizer = MockTokenizer(vocab_size=cfg.text.vocab_size)
    else:
        params, cfg = load_params_from_hf(args.model_name_or_path, dtype=dtype)
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(
            args.tokenizer_path or args.model_name_or_path
        )
    processor = VLProcessor(tokenizer, cfg)

    mesh = None
    if len(jax.devices()) > 1:
        from spacer_tpu.parallel import mesh_shape_for

        shape = mesh_shape_for(
            len(jax.devices()), tp=args.tp, fsdp=args.fsdp
        )
        mesh = create_mesh(shape)
        params, _ = shard_params(params, mesh)
    return cfg, params, processor, mesh
