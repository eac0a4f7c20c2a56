"""QwenEngine: the production eval inference path (processor -> rope index
-> vision encode -> grouped sampler) with a batch of different-sized
videos, against the tiny random model."""

import numpy as np
import jax
import jax.numpy as jnp

from spacer_tpu.data import MockTokenizer, VLProcessor
from spacer_tpu.evalharness import QwenEngine
from spacer_tpu.models.qwen25_vl import tiny_config, init_params


def test_engine_batched_videos():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    tok = MockTokenizer(vocab_size=cfg.text.vocab_size)
    proc = VLProcessor(tok, cfg)
    engine = QwenEngine(cfg, params, proc, attn_impl="xla", length_bucket=64)

    from PIL import Image

    rng = np.random.default_rng(0)

    def frames(n, size):
        return [
            Image.fromarray(rng.integers(0, 256, (size, size, 3), np.uint8))
            for _ in range(n)
        ]

    messages_list = [
        [{"role": "user", "content": [
            {"type": "video", "video": frames(2, 56)},
            {"type": "text", "text": "what is this"},
        ]}],
        [{"role": "user", "content": [
            {"type": "video", "video": frames(4, 112)},
            {"type": "text", "text": "and this other longer question"},
        ]}],
    ]
    out = engine.generate(messages_list, max_new_tokens=5, temperature=0.01)
    assert len(out) == 2
    assert all(isinstance(t, str) for t in out)

    # deterministic at near-greedy temperature with the same engine seed seq
    engine2 = QwenEngine(cfg, params, proc, attn_impl="xla", length_bucket=64)
    out2 = engine2.generate(messages_list, max_new_tokens=5, temperature=0.01)
    # note: temp 0.01 is near-greedy; logits gaps in a random model dwarf
    # the 0.01 noise, so outputs should match
    assert out == out2


def test_engine_mixed_image_video_batch():
    """Mixed image+video prompts: patches pack in placeholder appearance
    order, so the packed vision encode equals the per-medium encodes
    concatenated in that order (windows never cross grids)."""
    from PIL import Image

    from spacer_tpu.data import MockTokenizer, VLProcessor
    from spacer_tpu.data.processor import pack_vision_inputs
    from spacer_tpu.models.qwen25_vl.model import encode_vision

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    tok = MockTokenizer(vocab_size=cfg.text.vocab_size)
    proc = VLProcessor(tok, cfg)
    rng = np.random.default_rng(1)

    def frames(n, size):
        return [
            Image.fromarray(rng.integers(0, 256, (size, size, 3), np.uint8))
            for _ in range(n)
        ]

    img = Image.fromarray(rng.integers(0, 256, (84, 56, 3), np.uint8))
    messages = [[{"role": "user", "content": [
        {"type": "image", "image": img},
        {"type": "text", "text": "compare with"},
        {"type": "video", "video": frames(2, 56)},
    ]}]]
    enc = proc.process_messages(messages, add_generation_prompt=True)
    assert "pixel_values" in enc and "pixel_values_videos" in enc
    px, grids = pack_vision_inputs(enc)
    assert enc["media_order"] == [("image", 0), ("video", 0)]
    # appearance order: the image's grid first
    assert grids[0] == tuple(int(x) for x in enc["image_grid_thw"][0])

    packed = np.asarray(encode_vision(params, cfg, jnp.asarray(px), grids))
    e_img = np.asarray(encode_vision(
        params, cfg, jnp.asarray(enc["pixel_values"]), (grids[0],)
    ))
    e_vid = np.asarray(encode_vision(
        params, cfg, jnp.asarray(enc["pixel_values_videos"]), (grids[1],)
    ))
    np.testing.assert_allclose(
        packed, np.concatenate([e_img, e_vid]), rtol=1e-5, atol=1e-6
    )

    # and the engine path end-to-end
    engine = QwenEngine(cfg, params, proc, attn_impl="xla", length_bucket=64)
    out = engine.generate(messages, max_new_tokens=4, temperature=0.0)
    assert len(out) == 1 and isinstance(out[0], str)
