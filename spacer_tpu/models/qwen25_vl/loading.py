"""HF checkpoint (safetensors) -> spacer_tpu param pytree.

Name mapping covers both transformers layouts: the current
`model.language_model.*` / `model.visual.*` split and the legacy
`model.*` / `visual.*` one.  Linear weights are transposed (HF stores
(out, in)); the ViT Conv3d patch embed collapses to a dense kernel since
kernel == stride (modeling_qwen2_5_vl.py:67-90).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable, Mapping

import jax.numpy as jnp
import numpy as np

from spacer_tpu.models.qwen25_vl.config import Qwen25VLConfig


def _normalize_key(k: str) -> str:
    k = re.sub(r"^model\.language_model\.", "model.", k)
    k = re.sub(r"^model\.visual\.", "visual.", k)
    k = re.sub(r"^language_model\.model\.", "model.", k)
    return k


def params_from_torch_state_dict(
    state_dict: Mapping[str, Any], cfg: Qwen25VLConfig, dtype=jnp.float32
):
    """Build the param pytree from a {hf_name: array} mapping.

    Accepts torch tensors or numpy arrays (anything with .numpy()/__array__).
    """

    def arr(name: str) -> np.ndarray:
        # values are fetched lazily (state_dict may be a streaming Mapping
        # over safetensors shards — only .keys() is touched up front)
        v = state_dict[keymap[name]]
        if hasattr(v, "detach"):
            v = v.detach().to("cpu").float().numpy()
        return np.asarray(v)

    keymap = {_normalize_key(k): k for k in state_dict.keys()}
    t, v = cfg.text, cfg.vision

    def lin(name: str, bias: bool):
        p = {"kernel": jnp.asarray(arr(f"{name}.weight").T, dtype)}
        if bias:
            p["bias"] = jnp.asarray(arr(f"{name}.bias"), dtype)
        return p

    def stack_lin(fmt: str, n: int, bias: bool):
        ks = np.stack([arr(fmt.format(i) + ".weight").T for i in range(n)])
        p = {"kernel": jnp.asarray(ks, dtype)}
        if bias:
            bs = np.stack([arr(fmt.format(i) + ".bias") for i in range(n)])
            p["bias"] = jnp.asarray(bs, dtype)
        return p

    def stack_norm(fmt: str, n: int):
        return {"scale": jnp.asarray(
            np.stack([arr(fmt.format(i) + ".weight") for i in range(n)]), dtype
        )}

    L = t.num_layers
    params: dict = {
        "model": {
            "embed_tokens": {
                "embedding": jnp.asarray(arr("model.embed_tokens.weight"), dtype)
            },
            "layers": {
                "input_layernorm": stack_norm(
                    "model.layers.{}.input_layernorm", L
                ),
                "post_attention_layernorm": stack_norm(
                    "model.layers.{}.post_attention_layernorm", L
                ),
                "self_attn": {
                    "q_proj": stack_lin("model.layers.{}.self_attn.q_proj", L, True),
                    "k_proj": stack_lin("model.layers.{}.self_attn.k_proj", L, True),
                    "v_proj": stack_lin("model.layers.{}.self_attn.v_proj", L, True),
                    "o_proj": stack_lin("model.layers.{}.self_attn.o_proj", L, False),
                },
                "mlp": {
                    "gate_proj": stack_lin("model.layers.{}.mlp.gate_proj", L, False),
                    "up_proj": stack_lin("model.layers.{}.mlp.up_proj", L, False),
                    "down_proj": stack_lin("model.layers.{}.mlp.down_proj", L, False),
                },
            },
            "norm": {"scale": jnp.asarray(arr("model.norm.weight"), dtype)},
        },
    }
    if not t.tie_word_embeddings:
        params["model"]["lm_head"] = {
            "kernel": jnp.asarray(arr("lm_head.weight").T, dtype)
        }

    def stack_norm_bias(fmt: str, n: int):
        return {
            "scale": jnp.asarray(
                np.stack([arr(fmt.format(i) + ".weight") for i in range(n)]),
                dtype,
            ),
            "bias": jnp.asarray(
                np.stack([arr(fmt.format(i) + ".bias") for i in range(n)]),
                dtype,
            ),
        }

    VD = v.depth
    patch_w = arr("visual.patch_embed.proj.weight")  # (D, C, tps, p, p)
    patch_kernel = patch_w.reshape(v.hidden_size, -1).T  # (patch_dim, D)
    if v.arch == "qwen2":
        norms = {
            "norm1": stack_norm_bias("visual.blocks.{}.norm1", VD),
            "norm2": stack_norm_bias("visual.blocks.{}.norm2", VD),
        }
        mlp = {
            "fc1": stack_lin("visual.blocks.{}.mlp.fc1", VD, True),
            "fc2": stack_lin("visual.blocks.{}.mlp.fc2", VD, True),
        }
        ln_q = {
            "scale": jnp.asarray(arr("visual.merger.ln_q.weight"), dtype),
            "bias": jnp.asarray(arr("visual.merger.ln_q.bias"), dtype),
        }
    else:
        norms = {
            "norm1": stack_norm("visual.blocks.{}.norm1", VD),
            "norm2": stack_norm("visual.blocks.{}.norm2", VD),
        }
        mlp = {
            "gate_proj": stack_lin("visual.blocks.{}.mlp.gate_proj", VD, True),
            "up_proj": stack_lin("visual.blocks.{}.mlp.up_proj", VD, True),
            "down_proj": stack_lin("visual.blocks.{}.mlp.down_proj", VD, True),
        }
        ln_q = {"scale": jnp.asarray(arr("visual.merger.ln_q.weight"), dtype)}
    params["visual"] = {
        "patch_embed": {"proj": {"kernel": jnp.asarray(patch_kernel, dtype)}},
        "blocks": {
            **norms,
            "attn": {
                "qkv": stack_lin("visual.blocks.{}.attn.qkv", VD, True),
                "proj": stack_lin("visual.blocks.{}.attn.proj", VD, True),
            },
            "mlp": mlp,
        },
        "merger": {
            "ln_q": ln_q,
            "mlp_0": lin("visual.merger.mlp.0", True),
            "mlp_2": lin("visual.merger.mlp.2", True),
        },
    }
    return params


def load_params_from_hf(
    checkpoint_dir: str, cfg: Qwen25VLConfig | None = None, dtype=jnp.bfloat16
):
    """Load from an HF checkpoint directory (config.json + *.safetensors).

    Returns (params, cfg).  Weights stream tensor-by-tensor from disk —
    peak host memory ~= one full checkpoint copy.
    """
    from safetensors import safe_open

    if cfg is None:
        with open(os.path.join(checkpoint_dir, "config.json")) as f:
            cfg = Qwen25VLConfig.from_hf_config(json.load(f))

    files = sorted(
        f for f in os.listdir(checkpoint_dir) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors in {checkpoint_dir}")

    class _LazyShards:
        """Mapping over all shards; tensors stream one at a time (peak host
        memory ~= the largest stacked layer group, not the checkpoint)."""

        def __init__(self):
            self._handles = [
                safe_open(os.path.join(checkpoint_dir, f), framework="np")
                for f in files
            ]
            self._where = {
                k: h for h in self._handles for k in h.keys()
            }

        def keys(self):
            return self._where.keys()

        def __getitem__(self, k):
            return self._where[k].get_tensor(k)

    params = params_from_torch_state_dict(_LazyShards(), cfg, dtype)
    return params, cfg


def export_to_safetensors(params, cfg: Qwen25VLConfig, out_path: str):
    """Inverse mapping: param pytree -> HF-named safetensors file (for eval
    parity with torch-side tooling).

    Tensors are written in their own dtype (bf16 params -> BF16 tensors,
    matching the reference's bf16 save_model artifact,
    zero3.json stage3_gather_16bit_weights_on_model_save; an f32 export
    would double the file AND contradict config.json's torch_dtype)."""
    from safetensors.numpy import save_file

    t, v = cfg.text, cfg.vision
    out: dict[str, np.ndarray] = {}

    def put(name, x):
        # ascontiguousarray is load-bearing: safetensors serializes the raw
        # buffer, silently ignoring the strides of transposed views
        # (dtype preserved: np.asarray on a jax bf16 array yields an
        # ml_dtypes.bfloat16 numpy array, which safetensors writes as BF16)
        out[name] = np.ascontiguousarray(np.asarray(x))

    m = params["model"]
    put("model.embed_tokens.weight", m["embed_tokens"]["embedding"])
    put("model.norm.weight", m["norm"]["scale"])
    if "lm_head" in m:
        put("lm_head.weight", np.asarray(m["lm_head"]["kernel"]).T)
    lyr = m["layers"]
    for i in range(t.num_layers):
        pre = f"model.layers.{i}"
        put(f"{pre}.input_layernorm.weight", lyr["input_layernorm"]["scale"][i])
        put(f"{pre}.post_attention_layernorm.weight",
            lyr["post_attention_layernorm"]["scale"][i])
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            p = lyr["self_attn"][proj]
            put(f"{pre}.self_attn.{proj}.weight", np.asarray(p["kernel"][i]).T)
            if "bias" in p:
                put(f"{pre}.self_attn.{proj}.bias", p["bias"][i])
        for proj in ("gate_proj", "up_proj", "down_proj"):
            p = lyr["mlp"][proj]
            put(f"{pre}.mlp.{proj}.weight", np.asarray(p["kernel"][i]).T)

    vis = params["visual"]
    pk = np.asarray(vis["patch_embed"]["proj"]["kernel"]).T.reshape(
        v.hidden_size, v.in_channels, v.temporal_patch_size, v.patch_size, v.patch_size
    )
    put("visual.patch_embed.proj.weight", pk)
    for i in range(v.depth):
        pre = f"visual.blocks.{i}"
        put(f"{pre}.norm1.weight", vis["blocks"]["norm1"]["scale"][i])
        put(f"{pre}.norm2.weight", vis["blocks"]["norm2"]["scale"][i])
        for name, sub in (("attn.qkv", "qkv"), ("attn.proj", "proj")):
            p = vis["blocks"]["attn"][sub]
            put(f"{pre}.{name}.weight", np.asarray(p["kernel"][i]).T)
            put(f"{pre}.{name}.bias", p["bias"][i])
        for proj in ("gate_proj", "up_proj", "down_proj"):
            p = vis["blocks"]["mlp"][proj]
            put(f"{pre}.mlp.{proj}.weight", np.asarray(p["kernel"][i]).T)
            put(f"{pre}.mlp.{proj}.bias", p["bias"][i])
    put("visual.merger.ln_q.weight", vis["merger"]["ln_q"]["scale"])
    put("visual.merger.mlp.0.weight", np.asarray(vis["merger"]["mlp_0"]["kernel"]).T)
    put("visual.merger.mlp.0.bias", vis["merger"]["mlp_0"]["bias"])
    put("visual.merger.mlp.2.weight", np.asarray(vis["merger"]["mlp_2"]["kernel"]).T)
    put("visual.merger.mlp.2.bias", vis["merger"]["mlp_2"]["bias"])
    save_file(out, out_path)
    return out_path
