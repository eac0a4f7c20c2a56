"""Correctness corners: the trainer's completion position arithmetic must
match a full get_rope_index recomputation, and batched generation with
multiple different-sized videos must scatter embeddings row-correctly."""

import numpy as np
import jax
import jax.numpy as jnp

from spacer_tpu.data import MockTokenizer, VLProcessor, render_chat_template
from spacer_tpu.models.qwen25_vl import (
    tiny_config, init_params, get_rope_index, forward,
)


def test_completion_positions_match_full_rope_index():
    """delta + P + t (the trainer/sampler shortcut) == get_rope_index over
    the full prompt+completion sequence, for a video prompt with left pad."""
    cfg = tiny_config()
    grid = [(2, 8, 12)]
    nv = (2 * 8 * 12) // 4
    prompt = (
        [10, 11, cfg.vision_start_token_id] + [cfg.video_token_id] * nv
        + [cfg.vision_end_token_id, 20]
    )
    pad = 8
    P = pad + len(prompt)
    prompt_ids = np.array([[cfg.pad_token_id] * pad + prompt])
    prompt_mask = np.array([[0] * pad + [1] * len(prompt)])
    pos, deltas = get_rope_index(
        cfg, prompt_ids, video_grid_thw=np.array(grid),
        attention_mask=prompt_mask,
    )
    C = 5
    completion = np.array([[30, 31, 32, 33, 34]])
    full_ids = np.concatenate([prompt_ids, completion], axis=1)
    full_mask = np.concatenate([prompt_mask, np.ones((1, C), np.int64)], axis=1)
    full_pos, _ = get_rope_index(
        cfg, full_ids, video_grid_thw=np.array(grid),
        attention_mask=full_mask,
    )
    # the shortcut used by sampler/trainer
    shortcut = deltas.reshape(-1, 1) + P + np.arange(C)[None, :]
    for axis in range(3):
        np.testing.assert_array_equal(
            full_pos[axis, 0, P:], shortcut[0],
            err_msg=f"axis {axis}",
        )


def test_multi_video_batch_forward_scatter():
    """Two prompts with different-sized videos in one batch: each row's
    placeholder span must receive its own video's embeddings."""
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    tok = MockTokenizer(vocab_size=cfg.text.vocab_size)
    proc = VLProcessor(tok, cfg)

    rng = np.random.default_rng(0)
    vid1 = rng.integers(0, 256, (2, 3, 56, 56)).astype(np.float32)    # grid (1,4,4) -> 4 tok
    vid2 = rng.integers(0, 256, (2, 3, 112, 112)).astype(np.float32)  # grid (1,8,8) -> 16 tok
    texts = [
        render_chat_template([{"role": "user", "content": [
            {"type": "video"}, {"type": "text", "text": "one"}]}]),
        render_chat_template([{"role": "user", "content": [
            {"type": "video"}, {"type": "text", "text": "two two two"}]}]),
    ]
    enc = proc(texts, videos=[vid1, vid2], fps=[2.0, 2.0])
    grids = [tuple(int(x) for x in g) for g in enc["video_grid_thw"]]
    assert grids == [(1, 4, 4), (1, 8, 8)]
    n_tok = [(g[0] * g[1] * g[2]) // 4 for g in grids]
    assert (enc["input_ids"] == cfg.video_token_id).sum(axis=1).tolist() == n_tok

    pos, _ = get_rope_index(
        cfg, enc["input_ids"], video_grid_thw=enc["video_grid_thw"],
        second_per_grid_ts=enc["second_per_grid_ts"],
        attention_mask=enc["attention_mask"],
    )
    logits, _ = forward(
        params, cfg, jnp.asarray(enc["input_ids"]),
        pixel_values=jnp.asarray(enc["pixel_values_videos"]),
        grid_thw=tuple(grids),
        position_ids=jnp.asarray(pos),
        kv_mask=jnp.asarray(enc["attention_mask"], bool),
        attn_impl="xla",
    )
    assert np.isfinite(np.asarray(logits)).all()

    # scatter correctness: zeroing the SECOND video's pixels must change
    # only the second row's logits
    px = np.asarray(enc["pixel_values_videos"]).copy()
    px[n_tok[0] * 4:] = 0.0
    logits2, _ = forward(
        params, cfg, jnp.asarray(enc["input_ids"]),
        pixel_values=jnp.asarray(px), grid_thw=tuple(grids),
        position_ids=jnp.asarray(pos),
        kv_mask=jnp.asarray(enc["attention_mask"], bool),
        attn_impl="xla",
    )
    d = np.abs(np.asarray(logits) - np.asarray(logits2)).max(axis=(1, 2))
    assert d[1] > 1e-3          # second row changed
    assert d[0] < 1e-5          # first row untouched
