"""Publishing: HF-layout save_pretrained + push_to_hub
(SG-RLVR.py:383-386, sft.py:260-266 conventions)."""

import json
import os

import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl import tiny_config, init_params
from spacer_tpu.train.publish import push_to_hub, save_pretrained


def _tiny_params(cfg):
    return init_params(jax.random.key(0), cfg, jnp.float32)


def test_save_pretrained_layout(tmp_path):
    cfg = tiny_config()
    params = _tiny_params(cfg)
    # a fake source checkpoint dir with processor files
    src = tmp_path / "src"
    src.mkdir()
    (src / "tokenizer_config.json").write_text('{"pad_token": "<pad>"}')
    (src / "preprocessor_config.json").write_text('{"patch_size": 14}')
    (src / "model-00001.safetensors").write_text("not copied")

    out = save_pretrained(str(tmp_path / "out"), params, cfg,
                          processor_dir=str(src))
    names = set(os.listdir(out))
    # model + config + processor alongside (sft.py:260-266), weights NOT
    # copied from the source dir
    assert "model.safetensors" in names
    assert "config.json" in names
    assert "tokenizer_config.json" in names
    assert "preprocessor_config.json" in names
    assert "model-00001.safetensors" not in names

    hf_cfg = json.loads((tmp_path / "out" / "config.json").read_text())
    assert hf_cfg["use_cache"] is True  # sft.py:263-265
    assert hf_cfg["vocab_size"] == cfg.text.vocab_size
    assert hf_cfg["num_hidden_layers"] == cfg.text.num_layers
    assert hf_cfg["rope_scaling"]["mrope_section"] == list(
        cfg.text.mrope_section)

    # the exported weights reload through the HF-name loader
    from safetensors import safe_open

    from spacer_tpu.models.qwen25_vl import params_from_torch_state_dict

    state = {}
    with safe_open(os.path.join(out, "model.safetensors"),
                   framework="np") as f:
        for k in f.keys():
            state[k] = f.get_tensor(k)
    restored = params_from_torch_state_dict(state, cfg, jnp.float32)
    assert jax.tree_util.tree_structure(restored) == \
        jax.tree_util.tree_structure(params)


class _StubApi:
    def __init__(self):
        self.calls = []

    def create_repo(self, repo_id, private=True, exist_ok=True):
        self.calls.append(("create_repo", repo_id, private))

    def upload_folder(self, repo_id, folder_path):
        self.calls.append(("upload_folder", repo_id, folder_path))


def test_push_to_hub_call_path(tmp_path):
    api = _StubApi()
    out = push_to_hub("org/spacer-tpu", str(tmp_path), api=api)
    assert out == "org/spacer-tpu"
    assert api.calls == [
        ("create_repo", "org/spacer-tpu", True),
        ("upload_folder", "org/spacer-tpu", str(tmp_path)),
    ]


def test_save_pretrained_preserves_dtype(tmp_path):
    """bf16 params export as BF16 tensors and config.json's torch_dtype
    matches what was written (ADVICE r4: an f32 export under a declared
    bfloat16 config doubled the artifact and contradicted itself)."""
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.bfloat16)
    out = save_pretrained(str(tmp_path / "out"), params, cfg)

    from safetensors import safe_open

    with safe_open(os.path.join(out, "model.safetensors"),
                   framework="np") as f:
        k = next(iter(f.keys()))
        assert f.get_tensor(k).dtype.name == "bfloat16"
    hf_cfg = json.loads((tmp_path / "out" / "config.json").read_text())
    assert hf_cfg["torch_dtype"] == "bfloat16"

    # f32 params -> float32 declared and written
    params32 = _tiny_params(cfg)
    out32 = save_pretrained(str(tmp_path / "out32"), params32, cfg)
    hf_cfg32 = json.loads((tmp_path / "out32" / "config.json").read_text())
    assert hf_cfg32["torch_dtype"] == "float32"


def test_save_pretrained_aria_roundtrip(tmp_path):
    """Aria export (VERDICT r4 missing #3): safetensors + config.json
    round-trip through load-from-HF with exact values."""
    import numpy as np

    from spacer_tpu.models.aria import init_params as init_aria_params
    from spacer_tpu.models.aria import tiny_aria_config
    from spacer_tpu.models.aria.config import AriaConfig
    from spacer_tpu.models.aria.loading import params_from_torch_state_dict

    cfg = tiny_aria_config()
    params = init_aria_params(jax.random.key(1), cfg, jnp.float32)
    out = save_pretrained(str(tmp_path / "aria"), params, cfg)

    hf_cfg = json.loads((tmp_path / "aria" / "config.json").read_text())
    assert hf_cfg["model_type"] == "aria"
    cfg2 = AriaConfig.from_hf_config(hf_cfg)
    assert cfg2.text == cfg.text and cfg2.vision == cfg.vision
    assert cfg2.projector_patch_to_query == cfg.projector_patch_to_query

    from safetensors import safe_open

    state = {}
    with safe_open(os.path.join(out, "model.safetensors"),
                   framework="np") as f:
        for k in f.keys():
            state[k] = f.get_tensor(k)
    restored = params_from_torch_state_dict(state, cfg2, jnp.float32)
    assert jax.tree_util.tree_structure(restored) == \
        jax.tree_util.tree_structure(params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_push_to_hub_requires_repo_id(tmp_path):
    """push_to_hub=True without hub_model_id must raise, not publish to a
    repo named after the output directory (ADVICE r4)."""
    import pytest

    from spacer_tpu.data.processor import MockTokenizer, VLProcessor
    from spacer_tpu.train.trainer import SGRLVRConfig, SGRLVRTrainer

    cfg = tiny_config()
    params = _tiny_params(cfg)
    proc = VLProcessor(MockTokenizer(vocab_size=cfg.text.vocab_size), cfg)
    tr = SGRLVRTrainer(
        cfg, params, proc, reward_funcs=[], train_dataset=[],
        args=SGRLVRConfig(output_dir=str(tmp_path), beta=0.0,
                          push_to_hub=True),
    )
    with pytest.raises(ValueError, match="hub_model_id"):
        tr.save_pretrained()
    # the guard fires before any export work
    assert not os.path.exists(os.path.join(str(tmp_path), "final"))


def test_trainer_save_pretrained(tmp_path):
    """SGRLVRTrainer.save_pretrained exports + publishes via args flags."""
    from spacer_tpu.data.processor import MockTokenizer, VLProcessor
    from spacer_tpu.train.trainer import SGRLVRConfig, SGRLVRTrainer

    cfg = tiny_config()
    params = _tiny_params(cfg)
    proc = VLProcessor(MockTokenizer(vocab_size=cfg.text.vocab_size), cfg)
    tr = SGRLVRTrainer(
        cfg, params, proc, reward_funcs=[], train_dataset=[],
        args=SGRLVRConfig(output_dir=str(tmp_path), beta=0.0),
    )
    out = tr.save_pretrained()
    assert os.path.exists(os.path.join(out, "model.safetensors"))
    assert os.path.exists(os.path.join(out, "config.json"))
