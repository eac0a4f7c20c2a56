"""Aria processor parity vs the HF AriaImageProcessor / AriaProcessor rules."""

import numpy as np
import pytest

from spacer_tpu.data.aria_processor import (
    AriaProcessor,
    MockAriaTokenizer,
    patch_level_inputs,
    preprocess_aria_image,
    render_aria_chat_template,
    select_best_resolution,
    SIZE_CONVERSION,
    SPLIT_RESOLUTIONS,
)
from spacer_tpu.models.aria.config import ARIA_25B


def _hf_image_processor(**kw):
    from transformers.models.aria.image_processing_aria import (
        AriaImageProcessor,
    )

    return AriaImageProcessor(**kw)


@pytest.mark.parametrize("hw", [(480, 640), (1024, 768), (980, 980), (200, 900)])
@pytest.mark.parametrize("max_size", [490, 980])
def test_image_preprocess_matches_hf(hw, max_size):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(*hw, 3), dtype=np.uint8)
    hf = _hf_image_processor(max_image_size=max_size)
    ref = hf.preprocess([img], return_tensors="np", input_data_format="channels_last")
    px, mask, n = preprocess_aria_image(img, max_image_size=max_size)
    assert n == int(ref["num_crops"])
    ref_px = np.asarray(ref["pixel_values"]).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(px, ref_px, atol=2e-3)
    np.testing.assert_array_equal(
        mask.astype(np.int64), np.asarray(ref["pixel_mask"])
    )


def test_image_preprocess_split_matches_hf():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(700, 1400, 3), dtype=np.uint8)
    hf = _hf_image_processor(max_image_size=490, split_image=True)
    ref = hf.preprocess([img], return_tensors="np", input_data_format="channels_last")
    px, mask, n = preprocess_aria_image(
        img, max_image_size=490, split_image=True
    )
    assert n == int(ref["num_crops"])
    ref_px = np.asarray(ref["pixel_values"]).transpose(0, 2, 3, 1)
    assert px.shape == ref_px.shape
    np.testing.assert_allclose(px, ref_px, atol=2e-3)


def test_select_best_resolution_matches_hf():
    from transformers.image_processing_utils import (
        select_best_resolution as hf_select,
    )

    for hw in [(300, 500), (700, 1400), (980, 980), (4000, 500), (50, 50)]:
        assert select_best_resolution(hw, SPLIT_RESOLUTIONS) == tuple(
            hf_select(hw, [list(r) for r in SPLIT_RESOLUTIONS])
        )


def test_token_expansion_rule():
    """Every <|img|> expands by max(num_crops) * tokens_per_image
    (processing_aria.py:126-133 quirk: the MAX is batch-wide)."""
    tok = MockAriaTokenizer()
    proc = AriaProcessor(tok, max_image_size=490)
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, size=(100, 80, 3), dtype=np.uint8)
    out = proc(["<|img|> hi", "plain"], images=[img])
    n_img = int((out["input_ids"] == tok.image_token_id).sum())
    assert n_img == SIZE_CONVERSION[490] * 1
    assert out["pixel_values"].shape == (1, 490, 490, 3)
    assert out["patch_mask"].shape == (1, 35 * 35)
    assert out["pixel_position_ids"].shape == (1, 35 * 35)


def test_patch_level_inputs_against_hf_mask_rule():
    """Patch valid iff any covered pixel valid; bucketed ids match the
    HF vision tower's python loop."""
    import torch
    from transformers import AriaForConditionalGeneration

    cfg = ARIA_25B
    S, p = 980, 14
    pixel_mask = np.zeros((1, S, S), bool)
    pixel_mask[:, :489, :700] = True  # 35x50 partial region
    patch_mask, pos_ids = patch_level_inputs(pixel_mask, cfg)
    side = S // p
    # ceil(489/14)=35, ceil(700/14)=50
    grid = patch_mask.reshape(1, side, side)
    assert int(grid[0, :, 0].sum()) == 35
    assert int(grid[0, 0, :].sum()) == 50
    # bucketized ids: compare against the HF embeddings loop directly
    emb_cls = __import__(
        "transformers.models.idefics3.modeling_idefics3",
        fromlist=["Idefics3VisionEmbeddings"],
    ).Idefics3VisionEmbeddings

    class _C:  # minimal config shim
        hidden_size = 8
        image_size = S
        patch_size = p
        num_channels = 3

    emb = emb_cls(_C())
    mask_t = torch.from_numpy(patch_mask.reshape(1, side, side))
    boundaries = torch.arange(1 / emb.num_patches_per_side, 1.0,
                              1 / emb.num_patches_per_side)
    nb_h = int(mask_t[0][:, 0].sum())
    nb_w = int(mask_t[0][0].sum())
    fh = torch.arange(nb_h) / nb_h * (1 - 1e-6)
    fw = torch.arange(nb_w) / nb_w * (1 - 1e-6)
    bh = torch.bucketize(fh, boundaries, right=True)
    bw = torch.bucketize(fw, boundaries, right=True)
    ref_ids = (bh[:, None] * emb.num_patches_per_side + bw).flatten().numpy()
    mine = pos_ids[0][patch_mask[0]]
    np.testing.assert_array_equal(mine, ref_ids)


def test_chat_template_and_process_messages():
    tok = MockAriaTokenizer()
    proc = AriaProcessor(tok, max_image_size=490)
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(64, 64, 3), dtype=np.uint8)
    messages = [[
        {"role": "user", "content": [
            {"type": "image", "image": img},
            {"type": "text", "text": "what is this"},
        ]},
    ]]
    text = render_aria_chat_template(messages[0])
    assert "<fim_prefix><|img|><fim_suffix>" in text
    assert text.endswith("<|im_start|>assistant\n")
    out = proc.process_messages(messages)
    assert (out["input_ids"] == tok.image_token_id).sum() == SIZE_CONVERSION[490]
    assert out["pixel_values"].shape[0] == 1
