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
