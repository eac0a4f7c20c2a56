"""HF safetensors export/import roundtrip and model-only checkpointing."""

import numpy as np
import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl import (
    tiny_config,
    init_params,
    load_params_from_hf,
    params_from_torch_state_dict,
)
from spacer_tpu.models.qwen25_vl.loading import export_to_safetensors


def test_safetensors_roundtrip(tmp_path):
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    out = str(tmp_path / "model.safetensors")
    export_to_safetensors(params, cfg, out)

    from safetensors import safe_open

    state = {}
    with safe_open(out, framework="np") as f:
        for k in f.keys():
            state[k] = f.get_tensor(k)
    assert "model.layers.0.self_attn.q_proj.weight" in state
    assert "visual.patch_embed.proj.weight" in state
    assert state["visual.patch_embed.proj.weight"].shape == (
        cfg.vision.hidden_size, 3, 2, 14, 14
    )

    restored = params_from_torch_state_dict(state, cfg, jnp.float32)
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(params),
               key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(restored),
               key=lambda kv: str(kv[0])),
    ):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=str(pa))


def test_model_only_checkpoint(tmp_path):
    from spacer_tpu.train.checkpoint import load_model_only, save_model_only

    cfg = tiny_config()
    params = init_params(jax.random.key(1), cfg, jnp.float32)
    path = save_model_only(str(tmp_path / "ckpt"), params)
    restored = load_model_only(path, params)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(params)[0]),
        np.asarray(jax.tree.leaves(restored)[0]),
    )
