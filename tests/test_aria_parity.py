"""Aria family numeric parity vs HF torch at tiny scale.

Mirrors the strategy of tests/test_model_parity.py: build a tiny HF model,
copy its weights into the JAX layout, compare logits/features.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from spacer_tpu.models.aria.config import tiny_aria_config
from spacer_tpu.models.aria.language import (
    init_lm_params,
    lm_forward,
    positions_1d_to_3d,
)


def _hf_text_config(cfg):
    from transformers.models.aria.configuration_aria import AriaTextConfig

    t = cfg.text
    return AriaTextConfig(
        vocab_size=t.vocab_size,
        hidden_size=t.hidden_size,
        intermediate_size=t.intermediate_size,
        num_hidden_layers=t.num_layers,
        num_attention_heads=t.num_heads,
        num_key_value_heads=t.num_kv_heads,
        rms_norm_eps=t.rms_norm_eps,
        rope_theta=t.rope_theta,
        max_position_embeddings=t.max_position_embeddings,
        attention_bias=t.attention_bias,
        moe_num_experts=t.moe_num_experts,
        moe_topk=t.moe_topk,
        moe_num_shared_experts=t.moe_num_shared_experts,
        head_dim=t.head_dim,
        tie_word_embeddings=t.tie_word_embeddings,
        pad_token_id=None,
    )


def _t(x):
    return jnp.asarray(x.detach().numpy())


def lm_params_from_torch(model, cfg):
    """Torch AriaTextForCausalLM -> stacked JAX param tree."""
    layers = model.model.layers

    def stack(get):
        return jnp.stack([get(l) for l in layers])

    params = {
        "embed_tokens": {"embedding": _t(model.model.embed_tokens.weight)},
        "layers": {
            "input_layernorm": {
                "scale": stack(lambda l: _t(l.input_layernorm.weight))},
            "post_attention_layernorm": {
                "scale": stack(lambda l: _t(l.post_attention_layernorm.weight))},
            "self_attn": {
                "q_proj": {"kernel": stack(lambda l: _t(l.self_attn.q_proj.weight).T)},
                "k_proj": {"kernel": stack(lambda l: _t(l.self_attn.k_proj.weight).T)},
                "v_proj": {"kernel": stack(lambda l: _t(l.self_attn.v_proj.weight).T)},
                "o_proj": {"kernel": stack(lambda l: _t(l.self_attn.o_proj.weight).T)},
            },
            "mlp": {
                "router": {"kernel": stack(lambda l: _t(l.mlp.router.weight).T)},
                "experts": {
                    "fc1": {"kernel": stack(lambda l: _t(l.mlp.experts.fc1.weight))},
                    "fc2": {"kernel": stack(lambda l: _t(l.mlp.experts.fc2.weight))},
                },
                "shared": {
                    "gate_proj": {"kernel": stack(
                        lambda l: _t(l.mlp.shared_experts.gate_proj.weight).T)},
                    "up_proj": {"kernel": stack(
                        lambda l: _t(l.mlp.shared_experts.up_proj.weight).T)},
                    "down_proj": {"kernel": stack(
                        lambda l: _t(l.mlp.shared_experts.down_proj.weight).T)},
                },
            },
        },
        "norm": {"scale": _t(model.model.norm.weight)},
    }
    if not cfg.text.tie_word_embeddings:
        params["lm_head"] = {"kernel": _t(model.lm_head.weight).T}
    return params


@pytest.fixture(scope="module")
def tiny_text():
    from transformers.models.aria.modeling_aria import AriaTextForCausalLM

    cfg = tiny_aria_config()
    torch.manual_seed(0)
    hf = AriaTextForCausalLM(_hf_text_config(cfg)).eval()
    # router defaults init near zero -> make routing decisive
    with torch.no_grad():
        for l in hf.model.layers:
            l.mlp.router.weight.normal_(0, 0.5)
    params = lm_params_from_torch(hf, cfg)
    return cfg, hf, params


def test_text_logits_parity(tiny_text):
    cfg, hf, params = tiny_text
    rng = np.random.RandomState(0)
    ids = rng.randint(10, cfg.text.vocab_size, size=(2, 13))
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).logits.numpy()
    pos = positions_1d_to_3d(jnp.arange(13)[None, :].repeat(2, 0))
    got, _ = lm_forward(params, cfg.text, input_ids=jnp.asarray(ids),
                        position_ids=pos)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_text_logits_parity_with_padding(tiny_text):
    cfg, hf, params = tiny_text
    rng = np.random.RandomState(1)
    S, pad = 9, 4
    ids = rng.randint(10, cfg.text.vocab_size, size=(2, S))
    ids_pad = np.concatenate([np.zeros((2, pad), np.int64), ids], axis=1)
    mask = np.concatenate([np.zeros((2, pad), np.int64),
                           np.ones((2, S), np.int64)], axis=1)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids_pad),
                 attention_mask=torch.from_numpy(mask)).logits.numpy()
    # HF computes positions from cache_position (0..S+pad); for left padding
    # HF's generate uses mask cumsum. Compare with identical positions:
    pos1d = np.arange(S + pad)[None, :].repeat(2, 0)
    got, _ = lm_forward(
        params, cfg.text, input_ids=jnp.asarray(ids_pad),
        position_ids=positions_1d_to_3d(jnp.asarray(pos1d)),
        kv_mask=jnp.asarray(mask, bool),
    )
    np.testing.assert_allclose(
        np.asarray(got)[:, pad:], ref[:, pad:], rtol=2e-4, atol=2e-4
    )


def test_text_decode_matches_forward(tiny_text):
    """Incremental decode (shared-prefix engine) == full forward."""
    from spacer_tpu.models.aria.language import (
        init_kv_cache, lm_decode_step, split_layers,
    )

    cfg, _, params = tiny_text
    t = cfg.text
    rng = np.random.RandomState(2)
    B, S, NEW = 2, 7, 3
    ids = rng.randint(10, t.vocab_size, size=(B, S + NEW))

    pos_all = positions_1d_to_3d(jnp.arange(S + NEW)[None, :].repeat(B, 0))
    full, _ = lm_forward(params, t, input_ids=jnp.asarray(ids),
                         position_ids=pos_all)

    # prefill S, then decode NEW tokens one at a time
    prefix = init_kv_cache(t, B, S, dtype=jnp.float32)
    prefix_mask = jnp.ones((B, S), bool)
    logits, prefix = lm_forward(
        params, t, input_ids=jnp.asarray(ids[:, :S]),
        position_ids=pos_all[:, :, :S], kv_mask=prefix_mask,
        cache=prefix, cache_index=0,
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, :S]), rtol=2e-4, atol=2e-4
    )

    tail = init_kv_cache(t, B, NEW, dtype=jnp.float32)
    tail_positions = jnp.arange(NEW)
    for i in range(NEW):
        cur = jnp.asarray(ids[:, S + i: S + i + 1])
        pos3 = positions_1d_to_3d(jnp.full((B, 1), S + i, jnp.int32))
        tail_mask = jnp.broadcast_to(tail_positions[None] <= i, (B, NEW))
        step_logits, tail = lm_decode_step(
            params, t, cur, pos3, prefix, prefix_mask, tail, tail_mask,
            i, group=1,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full[:, S + i]),
            rtol=3e-4, atol=3e-4,
        )


def test_init_params_structure_matches_torch_layout(tiny_text):
    cfg, _, torch_params = tiny_text
    mine = init_lm_params(jax.random.key(0), cfg.text)
    ts = jax.tree.structure(torch_params)
    ms = jax.tree.structure(mine)
    assert ts == ms
    for a, b in zip(jax.tree.leaves(torch_params), jax.tree.leaves(mine)):
        assert a.shape == b.shape, (a.shape, b.shape)


# ---------------------------------------------------------------------------
# Full multimodal model parity (vision tower + projector + scatter + LM)
# ---------------------------------------------------------------------------


def _hf_full_config(cfg):
    from transformers import AriaConfig as HFAriaConfig

    v = cfg.vision
    return HFAriaConfig(
        text_config=_hf_text_config(cfg),
        vision_config=dict(
            hidden_size=v.hidden_size,
            intermediate_size=v.intermediate_size,
            num_hidden_layers=v.num_layers,
            num_attention_heads=v.num_heads,
            num_channels=v.num_channels,
            patch_size=v.patch_size,
            image_size=v.image_size,
            layer_norm_eps=v.layer_norm_eps,
        ),
        image_token_index=cfg.image_token_id,
        projector_patch_to_query_dict={
            k: q for k, q in cfg.projector_patch_to_query},
        pad_token_id=cfg.pad_token_id,
    )


@pytest.fixture(scope="module")
def tiny_full():
    from transformers import AriaForConditionalGeneration

    from spacer_tpu.models.aria.loading import params_from_torch_state_dict

    cfg = tiny_aria_config()
    torch.manual_seed(1)
    hf = AriaForConditionalGeneration(_hf_full_config(cfg)).eval()
    with torch.no_grad():
        for l in hf.model.language_model.layers:
            l.mlp.router.weight.normal_(0, 0.5)
        hf.model.multi_modal_projector.query.normal_(0, 0.5)
    params = params_from_torch_state_dict(hf.state_dict(), cfg)
    return cfg, hf, params


def _ids_with_image_tokens(cfg, rng, S, n_img):
    ids = rng.randint(10, cfg.text.vocab_size, size=(1, S))
    ids[0, 2:2 + n_img] = cfg.image_token_id
    return ids


def test_full_model_parity_with_image(tiny_full):
    from spacer_tpu.models.aria.model import forward
    from spacer_tpu.models.aria.vision import vision_position_ids

    cfg, hf, params = tiny_full
    v = cfg.vision
    rng = np.random.RandomState(3)
    # one full-size image crop: 56x56 -> 4x4 patches -> 8 queries
    pix = rng.randn(1, v.num_channels, v.image_size, v.image_size
                    ).astype(np.float32)
    ids = _ids_with_image_tokens(cfg, rng, S=16, n_img=8)

    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(pix)).logits.numpy()

    side = v.image_size // v.patch_size
    pos_ids = vision_position_ids(side, side, v)[None]
    got, _ = forward(
        params, cfg, jnp.asarray(ids),
        pixel_values=jnp.asarray(pix.transpose(0, 2, 3, 1)),
        pixel_position_ids=jnp.asarray(pos_ids),
        patch_mask=jnp.ones((1, side * side), bool),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=6e-4, atol=6e-4)


def test_full_model_parity_with_pixel_mask(tiny_full):
    """Partial image (42x56 valid in a 56x56 canvas): NaViT bucketed
    positions + attention masking must match HF end to end."""
    from spacer_tpu.models.aria.model import forward
    from spacer_tpu.models.aria.vision import vision_position_ids

    cfg, hf, params = tiny_full
    v = cfg.vision
    rng = np.random.RandomState(4)
    pix = rng.randn(1, v.num_channels, v.image_size, v.image_size
                    ).astype(np.float32)
    pixel_mask = np.zeros((1, v.image_size, v.image_size), np.int64)
    pixel_mask[:, :42, :] = 1  # 3x4 valid patch grid
    ids = _ids_with_image_tokens(cfg, rng, S=16, n_img=8)

    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(pix),
                 pixel_mask=torch.from_numpy(pixel_mask)).logits.numpy()

    side = v.image_size // v.patch_size
    pos_ids = vision_position_ids(3, 4, v, max_h=side, max_w=side)[None]
    patch_mask = np.zeros((1, side, side), bool)
    patch_mask[:, :3, :4] = True
    got, _ = forward(
        params, cfg, jnp.asarray(ids),
        pixel_values=jnp.asarray(pix.transpose(0, 2, 3, 1)),
        pixel_position_ids=jnp.asarray(pos_ids),
        patch_mask=jnp.asarray(patch_mask.reshape(1, -1)),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=6e-4, atol=6e-4)
