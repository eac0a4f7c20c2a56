"""Model publishing: HF-layout export + push_to_hub.

Reference parity:
  - SG-RLVR.py:383-386  trainer.save_model(output_dir); if push_to_hub:
    trainer.push_to_hub(dataset_name=...)
  - sft.py:260-266      save processor ALONGSIDE the model dir and restore
    use_cache=True in the saved config on the main process.

The TPU build's eval/serving stack reads safetensors directly, so the
publishable artifact is an HF-layout directory: model.safetensors +
config.json + the processor/tokenizer files.  `push_to_hub` uploads that
directory via huggingface_hub when the package and network exist, and
fails with a clear actionable error otherwise (this environment has zero
egress; the call path is still exercised by tests through a stub API).
"""

from __future__ import annotations

import json
import os
import shutil

# files the HF processor convention saves alongside the model
# (AutoProcessor.save_pretrained output set for Qwen2.5-VL / Aria)
_PROCESSOR_FILES = (
    "tokenizer.json",
    "tokenizer_config.json",
    "vocab.json",
    "merges.txt",
    "special_tokens_map.json",
    "added_tokens.json",
    "preprocessor_config.json",
    "processor_config.json",
    "chat_template.json",
    "chat_template.jinja",
)


def _params_torch_dtype(params) -> str:
    """torch_dtype string derived from what the export actually writes
    (the LM kernels' dtype) so config.json cannot contradict the weights."""
    import numpy as np

    import jax

    leaves = jax.tree_util.tree_leaves(params)
    dt = np.asarray(leaves[0]).dtype if leaves else None
    return {"bfloat16": "bfloat16", "float16": "float16"}.get(
        str(dt), "float32")


def _config_to_hf_dict(cfg, torch_dtype: str = "bfloat16") -> dict:
    """Minimal HF-style config.json for a spacer_tpu model config.

    Enough for `AutoConfig`-free tooling round-trips (our own loader and
    the eval harness read these fields); `use_cache` is forced True to
    mirror sft.py:263-265 (training disables it under grad checkpointing,
    the published artifact must not)."""
    t = cfg.text
    d = {
        "model_type": getattr(cfg, "model_type", "qwen2_5_vl"),
        "vocab_size": t.vocab_size,
        "hidden_size": t.hidden_size,
        "intermediate_size": t.intermediate_size,
        "num_hidden_layers": t.num_layers,
        "num_attention_heads": t.num_heads,
        "num_key_value_heads": t.num_kv_heads,
        "rms_norm_eps": getattr(t, "rms_norm_eps", 1e-6),
        "rope_theta": getattr(t, "rope_theta", 1000000.0),
        "use_cache": True,
        "torch_dtype": torch_dtype,
    }
    if getattr(t, "mrope_section", None) is not None:
        d["rope_scaling"] = {
            "type": "mrope", "mrope_section": list(t.mrope_section)
        }
    for name in ("image_token_id", "video_token_id",
                 "vision_start_token_id", "vision_end_token_id"):
        if getattr(cfg, name, None) is not None:
            d[name] = getattr(cfg, name)
    return d


def save_pretrained(out_dir: str, params, cfg,
                    processor_dir: str | None = None) -> str:
    """Write an HF-layout model directory (the save_model + processor-save
    convention of sft.py:260-266 / SG-RLVR.py:383).

    params/cfg: the trained pytree and its config (family-dispatched
    export).  processor_dir: source checkpoint dir whose tokenizer/
    processor files are copied alongside (the reference always publishes
    processor WITH model so eval-side `AutoProcessor.from_pretrained`
    works on the output dir)."""
    from spacer_tpu.models.registry import family_for_config

    os.makedirs(out_dir, exist_ok=True)
    family = family_for_config(cfg)
    torch_dtype = _params_torch_dtype(params)
    if family.name == "aria":
        from spacer_tpu.models.aria.loading import (
            config_to_hf_dict,
            export_to_safetensors,
        )

        export_to_safetensors(
            params, cfg, os.path.join(out_dir, "model.safetensors"))
        hf_cfg = config_to_hf_dict(cfg, torch_dtype)
    else:
        from spacer_tpu.models.qwen25_vl.loading import export_to_safetensors

        export_to_safetensors(
            params, cfg, os.path.join(out_dir, "model.safetensors"))
        hf_cfg = _config_to_hf_dict(cfg, torch_dtype)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
    if processor_dir:
        for name in _PROCESSOR_FILES:
            src = os.path.join(processor_dir, name)
            if os.path.exists(src):
                shutil.copy2(src, os.path.join(out_dir, name))
    return out_dir


def push_to_hub(repo_id: str, folder: str, *, token: str | None = None,
                private: bool = True, api=None) -> str:
    """Upload a saved model directory to the Hugging Face Hub
    (SG-RLVR.py:384-386 trainer.push_to_hub role).

    `api` injects an HfApi-compatible object for tests; the default
    resolves huggingface_hub at call time so offline installs only pay
    when the flag is actually used."""
    if api is None:
        try:
            from huggingface_hub import HfApi
        except ImportError as e:  # pragma: no cover - env without hub
            raise RuntimeError(
                "push_to_hub requires the huggingface_hub package; "
                "install it or publish the directory manually "
                f"(artifact is complete at {folder})"
            ) from e
        api = HfApi(token=token)
    api.create_repo(repo_id, private=private, exist_ok=True)
    api.upload_folder(repo_id=repo_id, folder_path=folder)
    return repo_id
