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


def export_to_safetensors(params, cfg: AriaConfig, out_path: str):
    """Inverse of params_from_torch_state_dict: Aria pytree -> HF-named
    safetensors file, in the modern transformers layout
    (`model.language_model.*` / `model.vision_tower.*` /
    `model.multi_modal_projector.*`, AriaModel >= 4.52) — which
    _normalize_key also maps back, so the artifact round-trips through
    load_params_from_hf.  Completes the model-agnostic trainer.save_model
    parity (sft.py:260-266 works for the Aria run too,
    local_scripts/train_aria_moe.sh).

    Tensors keep their own dtype (bf16 params -> BF16 tensors)."""
    from safetensors.numpy import save_file

    t, v = cfg.text, cfg.vision
    out: dict[str, np.ndarray] = {}

    def put(name, x):
        # contiguity is load-bearing: safetensors serializes the raw buffer,
        # silently ignoring the strides of transposed views
        out[name] = np.ascontiguousarray(np.asarray(x))

    lm = "model.language_model"
    m = params["model"]
    put(f"{lm}.embed_tokens.weight", m["embed_tokens"]["embedding"])
    put(f"{lm}.norm.weight", m["norm"]["scale"])
    if "lm_head" in m:
        put("lm_head.weight", np.asarray(m["lm_head"]["kernel"]).T)
    lyr = m["layers"]
    for i in range(t.num_layers):
        pre = f"{lm}.layers.{i}"
        put(f"{pre}.input_layernorm.weight",
            lyr["input_layernorm"]["scale"][i])
        put(f"{pre}.post_attention_layernorm.weight",
            lyr["post_attention_layernorm"]["scale"][i])
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            p = lyr["self_attn"][proj]
            put(f"{pre}.self_attn.{proj}.weight",
                np.asarray(p["kernel"][i]).T)
            if "bias" in p:
                put(f"{pre}.self_attn.{proj}.bias", p["bias"][i])
        put(f"{pre}.mlp.router.weight",
            np.asarray(lyr["mlp"]["router"]["kernel"][i]).T)
        # expert grouped-GEMM weights are stored (E, in, out) on BOTH sides
        # (params_from_torch_state_dict loads them with transpose=False)
        put(f"{pre}.mlp.experts.fc1.weight",
            lyr["mlp"]["experts"]["fc1"]["kernel"][i])
        put(f"{pre}.mlp.experts.fc2.weight",
            lyr["mlp"]["experts"]["fc2"]["kernel"][i])
        for proj in ("gate_proj", "up_proj", "down_proj"):
            p = lyr["mlp"]["shared"][proj]
            put(f"{pre}.mlp.shared_experts.{proj}.weight",
                np.asarray(p["kernel"][i]).T)

    vt = "model.vision_tower"
    vis = params["visual"]
    # dense patchify kernel (p*p*C, D) in (dy, dx, c) row order -> conv
    # weight (D, C, p, p) (the exact inverse of the loader's permute)
    pk = np.asarray(vis["embeddings"]["patch_embedding"]["kernel"])
    put(f"{vt}.embeddings.patch_embedding.weight",
        pk.reshape(v.patch_size, v.patch_size, v.num_channels,
                   v.hidden_size).transpose(3, 2, 0, 1))
    put(f"{vt}.embeddings.patch_embedding.bias",
        vis["embeddings"]["patch_embedding"]["bias"])
    put(f"{vt}.embeddings.position_embedding.weight",
        vis["embeddings"]["position_embedding"]["embedding"])
    enc = vis["encoder"]
    for i in range(v.num_layers):
        pre = f"{vt}.encoder.layers.{i}"
        for name in ("layer_norm1", "layer_norm2"):
            put(f"{pre}.{name}.weight", enc[name]["scale"][i])
            put(f"{pre}.{name}.bias", enc[name]["bias"][i])
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            p = enc["self_attn"][proj]
            put(f"{pre}.self_attn.{proj}.weight",
                np.asarray(p["kernel"][i]).T)
            put(f"{pre}.self_attn.{proj}.bias", p["bias"][i])
        for proj in ("fc1", "fc2"):
            p = enc["mlp"][proj]
            put(f"{pre}.mlp.{proj}.weight", np.asarray(p["kernel"][i]).T)
            put(f"{pre}.mlp.{proj}.bias", p["bias"][i])
    put(f"{vt}.post_layernorm.weight", vis["post_layernorm"]["scale"])
    put(f"{vt}.post_layernorm.bias", vis["post_layernorm"]["bias"])

    pj = "model.multi_modal_projector"
    proj = params["projector"]
    put(f"{pj}.query", proj["query"])
    ca = proj["cross_attn"]
    for name in ("q_proj", "k_proj", "v_proj"):
        put(f"{pj}.cross_attn.{name}.weight",
            np.asarray(ca[name]["kernel"]).T)
    put(f"{pj}.cross_attn.multihead_attn.in_proj_weight",
        np.asarray(ca["mha_in_proj"]["kernel"]).T)
    put(f"{pj}.cross_attn.multihead_attn.in_proj_bias",
        ca["mha_in_proj"]["bias"])
    put(f"{pj}.cross_attn.multihead_attn.out_proj.weight",
        np.asarray(ca["mha_out_proj"]["kernel"]).T)
    put(f"{pj}.cross_attn.multihead_attn.out_proj.bias",
        ca["mha_out_proj"]["bias"])
    put(f"{pj}.cross_attn.linear.weight", np.asarray(ca["linear"]["kernel"]).T)
    put(f"{pj}.cross_attn.linear.bias", ca["linear"]["bias"])
    for name in ("layer_norm", "layer_norm_kv"):
        put(f"{pj}.cross_attn.{name}.weight", ca[name]["scale"])
        put(f"{pj}.cross_attn.{name}.bias", ca[name]["bias"])
    put(f"{pj}.layer_norm.weight", proj["layer_norm"]["scale"])
    put(f"{pj}.layer_norm.bias", proj["layer_norm"]["bias"])
    put(f"{pj}.feed_forward.linear_in.weight",
        np.asarray(proj["feed_forward"]["linear_in"]["kernel"]).T)
    put(f"{pj}.feed_forward.linear_out.weight",
        np.asarray(proj["feed_forward"]["linear_out"]["kernel"]).T)
    save_file(out, out_path)
    return out_path


def config_to_hf_dict(cfg: AriaConfig, torch_dtype: str = "bfloat16") -> dict:
    """HF-style config.json dict that AriaConfig.from_hf_config round-trips
    (the Aria leg of publish.save_pretrained)."""
    t, v = cfg.text, cfg.vision
    return {
        "model_type": "aria",
        "image_token_index": cfg.image_token_id,
        "projector_patch_to_query_dict": {
            str(k): val for k, val in cfg.projector_patch_to_query
        },
        "max_value_projector_patch_to_query_dict":
            cfg.max_projector_queries,
        "torch_dtype": torch_dtype,
        "text_config": {
            "vocab_size": t.vocab_size,
            "hidden_size": t.hidden_size,
            "intermediate_size": t.intermediate_size,
            "num_hidden_layers": t.num_layers,
            "num_attention_heads": t.num_heads,
            "num_key_value_heads": t.num_kv_heads,
            "rms_norm_eps": t.rms_norm_eps,
            "rope_theta": t.rope_theta,
            "tie_word_embeddings": t.tie_word_embeddings,
            "max_position_embeddings": t.max_position_embeddings,
            "attention_bias": t.attention_bias,
            "moe_num_experts": t.moe_num_experts,
            "moe_topk": t.moe_topk,
            "moe_num_shared_experts": t.moe_num_shared_experts,
        },
        "vision_config": {
            "hidden_size": v.hidden_size,
            "intermediate_size": v.intermediate_size,
            "num_hidden_layers": v.num_layers,
            "num_attention_heads": v.num_heads,
            "num_channels": v.num_channels,
            "patch_size": v.patch_size,
            "image_size": v.image_size,
            "layer_norm_eps": v.layer_norm_eps,
        },
    }


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
