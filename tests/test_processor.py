"""Chat template + processor expansion tests."""

import numpy as np

from spacer_tpu.data import MockTokenizer, VLProcessor, render_chat_template
from spacer_tpu.data.templates import make_conversation
from spacer_tpu.models.qwen25_vl import tiny_config


def test_render_chat_template_basic():
    messages = [
        {"role": "user", "content": [
            {"type": "video"},
            {"type": "text", "text": "What is shown?"},
        ]},
    ]
    out = render_chat_template(messages)
    assert out == (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\n<|vision_start|><|video_pad|><|vision_end|>"
        "What is shown?<|im_end|>\n"
        "<|im_start|>assistant\n"
    )


def test_render_chat_template_with_system():
    messages = [
        {"role": "system", "content": "Custom."},
        {"role": "user", "content": "hi"},
    ]
    out = render_chat_template(messages, add_generation_prompt=False)
    assert out == (
        "<|im_start|>system\nCustom.<|im_end|>\n"
        "<|im_start|>user\nhi<|im_end|>\n"
    )


def test_processor_video_expansion():
    cfg = tiny_config()
    tok = MockTokenizer(vocab_size=cfg.text.vocab_size)
    proc = VLProcessor(tok, cfg)

    # 4 frames of 56x84 -> grid (2, 4, 6) -> 48 patch tokens -> 12 merged
    video = np.random.default_rng(0).integers(
        0, 256, size=(4, 3, 56, 84), dtype=np.uint8
    ).astype(np.float32)
    text = render_chat_template([
        {"role": "user", "content": [
            {"type": "video"}, {"type": "text", "text": "q"},
        ]},
    ])
    out = proc([text], videos=[video], fps=[2.0])
    ids = out["input_ids"][0]
    n_video_tokens = int((ids == cfg.video_token_id).sum())
    assert tuple(out["video_grid_thw"][0]) == (2, 4, 6)
    assert n_video_tokens == (2 * 4 * 6) // 4
    assert out["pixel_values_videos"].shape == (2 * 4 * 6, cfg.vision.patch_dim)
    assert out["second_per_grid_ts"][0] == 1.0  # tps=2 / fps=2
    # vision_start right before the first video token
    first = int(np.argmax(ids == cfg.video_token_id))
    assert ids[first - 1] == tok.SPECIALS["<|vision_start|>"]


def test_processor_left_padding_batch():
    cfg = tiny_config()
    tok = MockTokenizer(vocab_size=cfg.text.vocab_size)
    proc = VLProcessor(tok, cfg)
    out = proc(["a b c", "a b c d e f"])
    assert out["input_ids"].shape == out["attention_mask"].shape
    np.testing.assert_array_equal(out["attention_mask"][0][:3], [0, 0, 0])
    assert out["input_ids"][0][0] == tok.pad_token_id
    assert out["attention_mask"][1].all()


def test_make_conversation_mc_options():
    row = {
        "problem": "How many chairs?",
        "problem_type": "multiple choice",
        "options": ["A. 1", "B. 2"],
        "data_type": "video",
        "data_source": "other",
        "path": "/x/v.mp4",
    }
    msg = make_conversation(row)
    text = msg["prompt"][0]["content"][1]["text"]
    assert "How many chairs?Options:\nA. 1\nB. 2\n" in text
    assert "single option letter" in text


def test_make_conversation_cogmap():
    row = {
        "problem": "Where is the table?",
        "problem_type": "numerical",
        "data_type": "video",
        "data_source": "SR_dataset",
        "path": "/x/vid9.mp4",
    }
    map_data = {"vid9": {"cognitive_map": {"table": [[1, 2]]}, "object_list": ["table"]}}
    msg = make_conversation(row, map_data)
    text = msg["prompt"][0]["content"][1]["text"]
    assert "10x10 grid" in text and "['table']" in text
    assert "numerical value" in text
