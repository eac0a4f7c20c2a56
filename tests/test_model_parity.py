"""Numerical parity of the JAX Qwen2.5-VL vs HF transformers (torch, CPU).

A tiny random-weight HF model is built locally (no downloads); its state dict
is mapped into the spacer_tpu pytree and outputs are compared in float32.
"""

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
from spacer_tpu.models.qwen25_vl.language import lm_forward
from spacer_tpu.models.qwen25_vl.vision import vision_layout, vit_forward


@pytest.fixture(scope="module")
def tiny():
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration,
    )

    cfg = tiny_config()
    hf_cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=cfg.text.vocab_size,
            hidden_size=cfg.text.hidden_size,
            intermediate_size=cfg.text.intermediate_size,
            num_hidden_layers=cfg.text.num_layers,
            num_attention_heads=cfg.text.num_heads,
            num_key_value_heads=cfg.text.num_kv_heads,
            rope_theta=cfg.text.rope_theta,
            rms_norm_eps=cfg.text.rms_norm_eps,
            rope_scaling={"type": "mrope", "mrope_section": list(cfg.text.mrope_section)},
            max_position_embeddings=4096,
            tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=cfg.vision.depth,
            hidden_size=cfg.vision.hidden_size,
            intermediate_size=cfg.vision.intermediate_size,
            num_heads=cfg.vision.num_heads,
            in_channels=3,
            patch_size=cfg.vision.patch_size,
            temporal_patch_size=cfg.vision.temporal_patch_size,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            window_size=cfg.vision.window_size,
            fullatt_block_indexes=list(cfg.vision.fullatt_block_indexes),
            out_hidden_size=cfg.vision.out_hidden_size,
            tokens_per_second=cfg.vision.tokens_per_second,
        ),
        image_token_id=cfg.image_token_id,
        video_token_id=cfg.video_token_id,
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id,
    )
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval()
    params = params_from_torch_state_dict(model.state_dict(), cfg, jnp.float32)
    return cfg, model, params


def test_text_only_logits_parity(tiny):
    cfg, model, params = tiny
    rng = np.random.default_rng(0)
    ids = rng.integers(10, cfg.text.vocab_size, size=(2, 17))
    mask = np.ones_like(ids)
    mask[1, :5] = 0  # left padding on row 1

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        ).logits.float().numpy()

    pos, _ = get_rope_index(cfg, ids, attention_mask=mask)
    ours, _ = lm_forward(
        params["model"], cfg.text,
        input_ids=jnp.asarray(ids), position_ids=jnp.asarray(pos),
        kv_mask=jnp.asarray(mask, bool), attn_impl="xla",
    )
    ours = np.asarray(ours)
    # compare only non-pad positions
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], out[valid], rtol=2e-4, atol=2e-4)


def test_vit_parity(tiny):
    cfg, model, params = tiny
    rng = np.random.default_rng(1)
    grid = [(2, 8, 12)]
    n_tokens = 2 * 8 * 12
    pixels = rng.normal(size=(n_tokens, cfg.vision.patch_dim)).astype(np.float32)

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


def test_vit_parity_multi_video(tiny):
    cfg, model, params = tiny
    rng = np.random.default_rng(4)
    grid = [(2, 4, 4), (1, 8, 8)]
    n_tokens = 2 * 4 * 4 + 64
    pixels = rng.normal(size=(n_tokens, cfg.vision.patch_dim)).astype(np.float32)

    with torch.no_grad():
        hf_out = model.model.visual(
            torch.tensor(pixels), grid_thw=torch.tensor(grid)
        ).float().numpy()

    layout = vision_layout(grid, cfg.vision)
    ours = np.asarray(
        vit_forward(params["visual"], cfg.vision, jnp.asarray(pixels), layout,
                    attn_impl="xla")
    )
    np.testing.assert_allclose(ours, hf_out, rtol=2e-4, atol=2e-4)


def test_rope_index_parity(tiny):
    cfg, model, params = tiny
    # sequence: [text x3][vision_start][video_pad x12][vision_end][text x4]
    grid = np.array([[2, 8, 12]])
    n_video_tokens = 2 * (8 // 2) * (12 // 2)  # 48
    ids = (
        [10, 11, 12, cfg.vision_start_token_id]
        + [cfg.video_token_id] * n_video_tokens
        + [cfg.vision_end_token_id, 20, 21, 22, 23]
    )
    ids = np.array([ids])
    mask = np.ones_like(ids)

    hf_pos, hf_delta = model.model.get_rope_index(
        torch.tensor(ids), video_grid_thw=torch.tensor(grid),
        second_per_grid_ts=torch.tensor([1.0]),
        attention_mask=torch.tensor(mask),
    )
    pos, delta = get_rope_index(
        cfg, ids, video_grid_thw=grid,
        second_per_grid_ts=np.array([1.0]), attention_mask=mask,
    )
    np.testing.assert_array_equal(pos, hf_pos.numpy())
    np.testing.assert_array_equal(delta, hf_delta.numpy())


def test_multimodal_forward_parity(tiny):
    cfg, model, params = tiny
    rng = np.random.default_rng(2)
    grid = [(2, 8, 12)]
    n_patches = 2 * 8 * 12
    n_video_tokens = n_patches // 4
    pixels = rng.normal(size=(n_patches, cfg.vision.patch_dim)).astype(np.float32)
    ids = (
        [10, 11, 12, cfg.vision_start_token_id]
        + [cfg.video_token_id] * n_video_tokens
        + [cfg.vision_end_token_id, 20, 21, 22, 23]
    )
    ids = np.array([ids])
    mask = np.ones_like(ids)

    with torch.no_grad():
        hf_logits = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values_videos=torch.tensor(pixels),
            video_grid_thw=torch.tensor(grid),
        ).logits.float().numpy()

    pos, _ = get_rope_index(
        cfg, ids, video_grid_thw=np.array(grid), attention_mask=mask
    )
    ours, _ = forward(
        params, cfg, jnp.asarray(ids),
        pixel_values=jnp.asarray(pixels), grid_thw=grid,
        position_ids=jnp.asarray(pos), kv_mask=jnp.asarray(mask, bool),
        attn_impl="xla",
    )
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=3e-4, atol=3e-4)


def test_kv_cache_decode_matches_full_forward(tiny):
    cfg, model, params = tiny
    rng = np.random.default_rng(3)
    ids = rng.integers(10, cfg.text.vocab_size, size=(2, 12))
    pos, _ = get_rope_index(cfg, ids)

    full, _ = lm_forward(
        params["model"], cfg.text, input_ids=jnp.asarray(ids),
        position_ids=jnp.asarray(pos), attn_impl="xla",
    )

    from spacer_tpu.models.qwen25_vl.language import init_kv_cache

    cache = init_kv_cache(cfg.text, 2, 16, dtype=jnp.float32)
    kv_mask = np.zeros((2, 16), bool)
    # prefill first 8
    kv_mask[:, :8] = True
    out, cache = lm_forward(
        params["model"], cfg.text, input_ids=jnp.asarray(ids[:, :8]),
        position_ids=jnp.asarray(pos[:, :, :8]),
        kv_mask=jnp.asarray(kv_mask), cache=cache, cache_index=0,
        attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(full[:, :8]), rtol=1e-4, atol=1e-4
    )
    # decode steps 8..11
    for t in range(8, 12):
        kv_mask[:, t] = True
        out, cache = lm_forward(
            params["model"], cfg.text, input_ids=jnp.asarray(ids[:, t : t + 1]),
            position_ids=jnp.asarray(pos[:, :, t : t + 1]),
            kv_mask=jnp.asarray(kv_mask), cache=cache, cache_index=t,
            attn_impl="xla",
        )
        np.testing.assert_allclose(
            np.asarray(out[:, 0]), np.asarray(full[:, t]), rtol=1e-4, atol=1e-4
        )
