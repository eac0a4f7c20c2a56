"""HF Aria checkpoint (safetensors) -> spacer_tpu param pytree.

Covers both transformers layouts: the current `model.language_model.*` /
`model.vision_tower.*` split (AriaModel, transformers >= 4.52) and the
legacy `language_model.model.*` / `vision_tower.*` one used by the
original rhymes-ai/Aria checkpoint (the mapping mirrored by
modeling_aria.py AriaForConditionalGeneration._checkpoint_conversion_mapping).
Linear weights transpose (HF stores (out, in)); the expert grouped-GEMM
weights (E, in, out) pass through untransposed; the stride-p conv patch
embedding permutes to the (dy, dx, c) patchify row order of
vision.patchify.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from spacer_tpu.models.aria.config import AriaConfig


def _normalize_key(k: str) -> str:
    k = re.sub(r"^model\.language_model\.", "model.", k)
    k = re.sub(r"^language_model\.model\.", "model.", k)
    k = re.sub(r"^language_model\.lm_head\.", "lm_head.", k)
    k = re.sub(r"^model\.vision_tower\.", "vision_tower.", k)
    k = re.sub(r"^model\.multi_modal_projector\.", "multi_modal_projector.", k)
    return k


def params_from_torch_state_dict(
    state_dict: Mapping[str, Any], cfg: AriaConfig, dtype=jnp.float32
):
    """Build the Aria param pytree from a {hf_name: array} mapping."""

    keymap = {_normalize_key(k): k for k in state_dict.keys()}

    def arr(name: str) -> np.ndarray:
        v = state_dict[keymap[name]]
        if hasattr(v, "detach"):
            v = v.detach().to("cpu").float().numpy()
        return np.asarray(v)

    def lin(name: str, bias: bool, transpose: bool = True):
        w = arr(f"{name}.weight")
        p = {"kernel": jnp.asarray(w.T if transpose else w, dtype)}
        if bias:
            p["bias"] = jnp.asarray(arr(f"{name}.bias"), dtype)
        return p

    def ln(name: str):
        return {
            "scale": jnp.asarray(arr(f"{name}.weight"), dtype),
            "bias": jnp.asarray(arr(f"{name}.bias"), dtype),
        }

    def stack_lin(fmt: str, n: int, bias: bool, transpose: bool = True):
        ws = [arr(fmt.format(i) + ".weight") for i in range(n)]
        ks = np.stack([w.T if transpose else w for w in ws])
        p = {"kernel": jnp.asarray(ks, dtype)}
        if bias:
            bs = np.stack([arr(fmt.format(i) + ".bias") for i in range(n)])
            p["bias"] = jnp.asarray(bs, dtype)
        return p

    def stack_norm(fmt: str, n: int, bias: bool = False):
        p = {"scale": jnp.asarray(
            np.stack([arr(fmt.format(i) + ".weight") for i in range(n)]), dtype
        )}
        if bias:
            p["bias"] = jnp.asarray(
                np.stack([arr(fmt.format(i) + ".bias") for i in range(n)]),
                dtype,
            )
        return p

    t, v = cfg.text, cfg.vision
    L = t.num_layers

    params: dict = {
        "model": {
            "embed_tokens": {
                "embedding": jnp.asarray(arr("model.embed_tokens.weight"), dtype)
            },
            "layers": {
                "input_layernorm": stack_norm(
                    "model.layers.{}.input_layernorm", L),
                "post_attention_layernorm": stack_norm(
                    "model.layers.{}.post_attention_layernorm", L),
                "self_attn": {
                    "q_proj": stack_lin("model.layers.{}.self_attn.q_proj",
                                        L, t.attention_bias),
                    "k_proj": stack_lin("model.layers.{}.self_attn.k_proj",
                                        L, t.attention_bias),
                    "v_proj": stack_lin("model.layers.{}.self_attn.v_proj",
                                        L, t.attention_bias),
                    "o_proj": stack_lin("model.layers.{}.self_attn.o_proj",
                                        L, False),
                },
                "mlp": {
                    "router": stack_lin("model.layers.{}.mlp.router", L, False),
                    "experts": {
                        "fc1": stack_lin("model.layers.{}.mlp.experts.fc1",
                                         L, False, transpose=False),
                        "fc2": stack_lin("model.layers.{}.mlp.experts.fc2",
                                         L, False, transpose=False),
                    },
                    "shared": {
                        "gate_proj": stack_lin(
                            "model.layers.{}.mlp.shared_experts.gate_proj",
                            L, False),
                        "up_proj": stack_lin(
                            "model.layers.{}.mlp.shared_experts.up_proj",
                            L, False),
                        "down_proj": stack_lin(
                            "model.layers.{}.mlp.shared_experts.down_proj",
                            L, False),
                    },
                },
            },
            "norm": {"scale": jnp.asarray(arr("model.norm.weight"), dtype)},
        },
    }
    if not t.tie_word_embeddings:
        params["model"]["lm_head"] = {
            "kernel": jnp.asarray(arr("lm_head.weight").T, dtype)
        }

    VD = v.num_layers
    # conv (D, C, p, p) -> dense kernel rows in (dy, dx, c) patchify order
    patch_w = arr("vision_tower.embeddings.patch_embedding.weight")
    patch_kernel = patch_w.transpose(2, 3, 1, 0).reshape(-1, v.hidden_size)
    params["visual"] = {
        "embeddings": {
            "patch_embedding": {
                "kernel": jnp.asarray(patch_kernel, dtype),
                "bias": jnp.asarray(
                    arr("vision_tower.embeddings.patch_embedding.bias"), dtype),
            },
            "position_embedding": {
                "embedding": jnp.asarray(
                    arr("vision_tower.embeddings.position_embedding.weight"),
                    dtype),
            },
        },
        "encoder": {
            "layer_norm1": stack_norm(
                "vision_tower.encoder.layers.{}.layer_norm1", VD, bias=True),
            "layer_norm2": stack_norm(
                "vision_tower.encoder.layers.{}.layer_norm2", VD, bias=True),
            "self_attn": {
                "q_proj": stack_lin(
                    "vision_tower.encoder.layers.{}.self_attn.q_proj", VD, True),
                "k_proj": stack_lin(
                    "vision_tower.encoder.layers.{}.self_attn.k_proj", VD, True),
                "v_proj": stack_lin(
                    "vision_tower.encoder.layers.{}.self_attn.v_proj", VD, True),
                "out_proj": stack_lin(
                    "vision_tower.encoder.layers.{}.self_attn.out_proj", VD, True),
            },
            "mlp": {
                "fc1": stack_lin(
                    "vision_tower.encoder.layers.{}.mlp.fc1", VD, True),
                "fc2": stack_lin(
                    "vision_tower.encoder.layers.{}.mlp.fc2", VD, True),
            },
        },
        "post_layernorm": ln("vision_tower.post_layernorm"),
    }

    pj = "multi_modal_projector"
    in_w = arr(f"{pj}.cross_attn.multihead_attn.in_proj_weight")  # (3Dv, Dv)
    params["projector"] = {
        "query": jnp.asarray(arr(f"{pj}.query"), dtype),
        "cross_attn": {
            "q_proj": lin(f"{pj}.cross_attn.q_proj", False),
            "k_proj": lin(f"{pj}.cross_attn.k_proj", False),
            "v_proj": lin(f"{pj}.cross_attn.v_proj", False),
            "mha_in_proj": {
                "kernel": jnp.asarray(in_w.T, dtype),
                "bias": jnp.asarray(
                    arr(f"{pj}.cross_attn.multihead_attn.in_proj_bias"), dtype),
            },
            "mha_out_proj": lin(f"{pj}.cross_attn.multihead_attn.out_proj", True),
            "linear": lin(f"{pj}.cross_attn.linear", True),
            "layer_norm": ln(f"{pj}.cross_attn.layer_norm"),
            "layer_norm_kv": ln(f"{pj}.cross_attn.layer_norm_kv"),
        },
        "layer_norm": ln(f"{pj}.layer_norm"),
        "feed_forward": {
            "linear_in": lin(f"{pj}.feed_forward.linear_in", False),
            "linear_out": lin(f"{pj}.feed_forward.linear_out", False),
        },
    }
    return params


def load_params_from_hf(
    checkpoint_dir: str, cfg: AriaConfig | None = None, dtype=jnp.bfloat16
):
    """Load from an HF checkpoint directory (config.json + *.safetensors).

    Returns (params, cfg); weights stream shard-by-shard (same contract as
    the Qwen loader)."""
    from safetensors import safe_open

    if cfg is None:
        with open(os.path.join(checkpoint_dir, "config.json")) as f:
            cfg = AriaConfig.from_hf_config(json.load(f))

    files = sorted(
        f for f in os.listdir(checkpoint_dir) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors in {checkpoint_dir}")

    class _LazyShards:
        def __init__(self):
            self._handles = [
                safe_open(os.path.join(checkpoint_dir, f), framework="np")
                for f in files
            ]
            self._where = {k: h for h in self._handles for k in h.keys()}

        def keys(self):
            return self._where.keys()

        def __getitem__(self, k):
            return self._where[k].get_tensor(k)

    params = params_from_torch_state_dict(_LazyShards(), cfg, dtype)
    return params, cfg
