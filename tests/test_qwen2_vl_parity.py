"""Qwen2-VL (non-2.5) family parity vs torch transformers: full-attention
quick-gelu ViT, LayerNorm norms, stride-1 temporal rope."""

import numpy as np
import pytest
import jax.numpy as jnp
import torch

from spacer_tpu.models.qwen25_vl import (
    tiny_config,
    forward,
    get_rope_index,
    params_from_torch_state_dict,
)
from spacer_tpu.models.qwen25_vl.vision import vision_layout, vit_forward


@pytest.fixture(scope="module")
def tiny2():
    from transformers.models.qwen2_vl.configuration_qwen2_vl import (
        Qwen2VLConfig,
    )
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VLForConditionalGeneration,
    )

    cfg = tiny_config(arch="qwen2")
    hf_cfg = Qwen2VLConfig(
        text_config=dict(
            vocab_size=cfg.text.vocab_size, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=cfg.text.rope_theta, rms_norm_eps=1e-6,
            rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]},
            max_position_embeddings=4096, tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=4, embed_dim=32, mlp_ratio=4, num_heads=2,
            in_channels=3, patch_size=14, temporal_patch_size=2,
            spatial_merge_size=2, hidden_size=64,
        ),
        image_token_id=6, video_token_id=7, vision_start_token_id=4,
        vision_end_token_id=5,
    )
    torch.manual_seed(0)
    model = Qwen2VLForConditionalGeneration(hf_cfg).eval()
    params = params_from_torch_state_dict(model.state_dict(), cfg, jnp.float32)
    return cfg, model, params


def test_qwen2_vit_parity(tiny2):
    cfg, model, params = tiny2
    rng = np.random.default_rng(0)
    grid = [(2, 8, 12)]
    pixels = rng.normal(size=(2 * 8 * 12, cfg.vision.patch_dim)).astype(np.float32)
    with torch.no_grad():
        hf_out = model.model.visual(
            torch.tensor(pixels), grid_thw=torch.tensor(grid)
        ).float().numpy()
    layout = vision_layout(grid, cfg.vision)
    ours = np.asarray(
        vit_forward(params["visual"], cfg.vision, jnp.asarray(pixels), layout,
                    attn_impl="xla")
    )
    assert ours.shape == hf_out.shape
    np.testing.assert_allclose(ours, hf_out, rtol=2e-4, atol=2e-4)


def test_qwen2_multimodal_forward_parity(tiny2):
    cfg, model, params = tiny2
    rng = np.random.default_rng(1)
    grid = [(2, 8, 12)]
    nv = (2 * 8 * 12) // 4
    pixels = rng.normal(size=(2 * 8 * 12, cfg.vision.patch_dim)).astype(np.float32)
    ids = np.array([
        [10, 11, cfg.vision_start_token_id] + [cfg.video_token_id] * nv
        + [cfg.vision_end_token_id, 20, 21]
    ])
    mask = np.ones_like(ids)
    with torch.no_grad():
        hf_logits = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            pixel_values_videos=torch.tensor(pixels),
            video_grid_thw=torch.tensor(grid),
        ).logits.float().numpy()
    pos, _ = get_rope_index(
        cfg, ids, video_grid_thw=np.array(grid), attention_mask=mask
    )
    # Qwen2-VL's own rope index (no second_per_grid_ts)
    hf_pos, _ = model.model.get_rope_index(
        torch.tensor(ids), video_grid_thw=torch.tensor(grid),
        attention_mask=torch.tensor(mask),
    )
    np.testing.assert_array_equal(pos, hf_pos.numpy())
    ours, _ = forward(
        params, cfg, jnp.asarray(ids),
        pixel_values=jnp.asarray(pixels), grid_thw=grid,
        position_ids=jnp.asarray(pos), kv_mask=jnp.asarray(mask, bool),
        attn_impl="xla",
    )
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=3e-4, atol=3e-4)
