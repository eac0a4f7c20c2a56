"""End-to-end Aria generation parity: Sampler greedy decode vs HF generate."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from spacer_tpu.models.aria.config import tiny_aria_config
from spacer_tpu.models.registry import aria_positions, get_family
from spacer_tpu.sampler import Sampler


@pytest.fixture(scope="module")
def tiny_full():
    from transformers import AriaForConditionalGeneration

    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_aria_parity import _hf_full_config

    from spacer_tpu.models.aria.loading import params_from_torch_state_dict

    cfg = tiny_aria_config()
    torch.manual_seed(7)
    hf = AriaForConditionalGeneration(_hf_full_config(cfg)).eval()
    with torch.no_grad():
        for l in hf.model.language_model.layers:
            l.mlp.router.weight.normal_(0, 0.5)
        hf.model.multi_modal_projector.query.normal_(0, 0.5)
    params = params_from_torch_state_dict(hf.state_dict(), cfg)
    return cfg, hf, params


def test_greedy_text_generation_matches_hf(tiny_full):
    cfg, hf, params = tiny_full
    rng = np.random.RandomState(0)
    B, S, NEW = 2, 7, 6
    ids = rng.randint(10, cfg.text.vocab_size, size=(B, S))
    mask = np.ones((B, S), np.int64)

    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            max_new_tokens=NEW, do_sample=False,
        ).numpy()[:, S:]

    pos3, deltas = aria_positions(cfg, ids, mask)
    sampler = Sampler(cfg, length_bucket=8)
    out = sampler.generate(
        ids.astype(np.int32), mask.astype(np.int32), params,
        position_ids=pos3, deltas=deltas,
        num_generations=1, max_new_tokens=NEW, temperature=0.0,
    )
    for b in range(B):
        n = int(out.lengths[b]) if (ref[b] == cfg.eos_token_id).any() else NEW
        np.testing.assert_array_equal(out.sequences[b, :n], ref[b, :n])


def test_greedy_image_generation_matches_hf(tiny_full):
    from spacer_tpu.models.aria.vision import vision_position_ids

    cfg, hf, params = tiny_full
    v = cfg.vision
    rng = np.random.RandomState(1)
    B, S, NEW = 1, 14, 5
    pix = rng.randn(1, 3, v.image_size, v.image_size).astype(np.float32)
    ids = rng.randint(10, cfg.text.vocab_size, size=(B, S))
    ids[0, 1:9] = cfg.image_token_id
    mask = np.ones((B, S), np.int64)

    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            pixel_values=torch.from_numpy(pix),
            max_new_tokens=NEW, do_sample=False,
        ).numpy()[:, S:]

    side = v.image_size // v.patch_size
    vision_kwargs = {
        "pixel_values": pix.transpose(0, 2, 3, 1),
        "position_ids": vision_position_ids(side, side, v)[None],
        "patch_mask": np.ones((1, side * side), bool),
    }
    pos3, deltas = aria_positions(cfg, ids, mask)
    sampler = Sampler(cfg, length_bucket=16)
    out = sampler.generate(
        ids.astype(np.int32), mask.astype(np.int32), params,
        position_ids=pos3, deltas=deltas, vision_kwargs=vision_kwargs,
        num_generations=1, max_new_tokens=NEW, temperature=0.0,
    )
    n = int(out.lengths[0]) if (ref[0] == cfg.eos_token_id).any() else NEW
    np.testing.assert_array_equal(out.sequences[0, :n], ref[0, :n])


def test_family_registry_dispatch():
    fam = get_family("rhymes-ai/Aria")
    assert fam.name == "aria"
    assert get_family("Qwen/Qwen2.5-VL-7B-Instruct").name == "qwen25_vl"
    assert get_family("some/other-model").name == "qwen25_vl"  # reference default
    assert get_family("AriaConfig").name == "aria"
