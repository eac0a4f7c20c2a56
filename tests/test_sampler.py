"""Sampler correctness: greedy decode parity vs HF generate, top-p math,
group expansion, EOS masking."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from spacer_tpu.models.qwen25_vl import tiny_config, params_from_torch_state_dict, get_rope_index
from spacer_tpu.sampler import Sampler
from spacer_tpu.sampler.sampler import completion_mask_from_ids, sample_logits


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
            vocab_size=cfg.text.vocab_size, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=cfg.text.rope_theta, rms_norm_eps=1e-6,
            rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]},
            max_position_embeddings=4096, tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=4, hidden_size=32, intermediate_size=64, num_heads=2,
            in_channels=3, patch_size=14, temporal_patch_size=2,
            spatial_merge_size=2, window_size=112,
            fullatt_block_indexes=[1, 3], out_hidden_size=64,
            tokens_per_second=2,
        ),
        image_token_id=6, video_token_id=7, vision_start_token_id=4,
        vision_end_token_id=5, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval()
    params = params_from_torch_state_dict(model.state_dict(), cfg, jnp.float32)
    return cfg, model, params


def test_greedy_matches_hf_generate(tiny):
    cfg, model, params = tiny
    rng = np.random.default_rng(0)
    B, S, NEW = 2, 11, 8
    ids = rng.integers(10, cfg.text.vocab_size, size=(B, S))
    mask = np.ones((B, S), dtype=np.int64)
    mask[1, :4] = 0
    ids[1, :4] = 0  # pad id

    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            max_new_tokens=NEW, do_sample=False, eos_token_id=2,
            pad_token_id=0,
        )
    hf_completion = hf_out[:, S:].numpy()

    pos, deltas = get_rope_index(cfg, ids, attention_mask=mask)
    sampler = Sampler(cfg, eos_token_id=2, pad_token_id=0, attn_impl="xla",
                      length_bucket=16)
    out = sampler.generate(
        ids, mask, params, position_ids=pos, deltas=deltas,
        num_generations=1, max_new_tokens=NEW, temperature=0.0, top_p=1.0,
    )
    # compare up to each row's completion end (HF pads after EOS with pad=0)
    for b in range(B):
        L = out.lengths[b]
        np.testing.assert_array_equal(
            out.sequences[b, :L], hf_completion[b, :L], err_msg=f"row {b}"
        )


def test_group_expansion_shapes(tiny):
    cfg, model, params = tiny
    rng = np.random.default_rng(1)
    B, S, G, NEW = 2, 7, 3, 4
    ids = rng.integers(10, cfg.text.vocab_size, size=(B, S))
    mask = np.ones((B, S), dtype=np.int64)
    pos, deltas = get_rope_index(cfg, ids, attention_mask=mask)
    sampler = Sampler(cfg, eos_token_id=2, pad_token_id=0, attn_impl="xla",
                      length_bucket=8)
    out = sampler.generate(
        ids, mask, params, position_ids=pos, deltas=deltas,
        num_generations=G, max_new_tokens=NEW, temperature=1.0, top_p=0.95,
        seed=7,
    )
    assert out.sequences.shape == (B * G, NEW)
    assert out.completion_mask.shape == (B * G, NEW)
    # greedy would make all G rows identical; with temp=1 they should differ
    assert not all(
        np.array_equal(out.sequences[0], out.sequences[g]) for g in range(1, G)
    )


def test_completion_mask_semantics():
    eos = 2
    ids = np.array([
        [5, 2, 9, 9],   # EOS at 1 -> mask [1,1,0,0]
        [5, 5, 5, 5],   # no EOS -> all 1
        [2, 7, 7, 7],   # EOS first -> [1,0,0,0]
    ])
    mask = completion_mask_from_ids(ids, eos)
    np.testing.assert_array_equal(
        mask, [[1, 1, 0, 0], [1, 1, 1, 1], [1, 0, 0, 0]]
    )


def test_sample_logits_top_p():
    # distribution [0.5, 0.3, 0.15, 0.05]: top_p=0.7 keeps tokens {0, 1}
    logits = jnp.log(jnp.array([[0.5, 0.3, 0.15, 0.05]]))
    counts = np.zeros(4)
    for i in range(200):
        t = int(sample_logits(logits, jax.random.key(i), 1.0, 0.7)[0])
        counts[t] += 1
    assert counts[2] == 0 and counts[3] == 0
    assert counts[0] > counts[1] > 0


def test_sample_logits_distribution_exact():
    """The inverse-CDF draw must target EXACTLY the renormalized nucleus:
    empirical frequencies over 40k draws vs p_i / p(nucleus), 5-sigma
    bands per token."""
    import jax.numpy as jnp

    p = np.array([0.45, 0.25, 0.15, 0.08, 0.04, 0.02, 0.007, 0.003])
    top_p = 0.9  # nucleus keeps {0,1,2,3} (cum 0.93 >= 0.9 at index 3)
    logits = jnp.broadcast_to(jnp.log(jnp.asarray(p))[None], (40000, 8))
    toks = np.asarray(sample_logits(logits, jax.random.key(7), 1.0, top_p))
    counts = np.bincount(toks, minlength=8)
    assert counts[4:].sum() == 0  # outside the nucleus: never
    kept = p[:4] / p[:4].sum()
    n = counts.sum()
    for i in range(4):
        sigma = np.sqrt(n * kept[i] * (1 - kept[i]))
        assert abs(counts[i] - n * kept[i]) < 5 * sigma, (i, counts)


def test_sample_logits_greedy():
    logits = jnp.array([[0.1, 5.0, 0.2], [3.0, 0.0, 0.1]])
    out = sample_logits(logits, jax.random.key(0), 0.0, 1.0)
    np.testing.assert_array_equal(np.asarray(out), [1, 0])


def test_out_of_vocab_ids_rejected():
    """OOV ids hit JAX's out-of-bounds gather, which clamps on CPU but
    fills NaN on TPU — the boundary guard must reject them on both."""
    import pytest

    from spacer_tpu.models.qwen25_vl import init_params, tiny_config
    from spacer_tpu.sampler import Sampler
    from spacer_tpu.serving import ContinuousBatcher

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    ids = np.full((1, 4), cfg.text.vocab_size + 5, np.int32)
    mask = np.ones((1, 4), np.int32)
    pos = np.broadcast_to(np.arange(4)[None, None], (3, 1, 4)).astype(np.int32)
    deltas = np.zeros((1, 1), np.int32)

    with pytest.raises(ValueError, match="vocab_size"):
        Sampler(cfg, length_bucket=8).generate(
            ids, mask, params, position_ids=pos, deltas=deltas,
            num_generations=1, max_new_tokens=2, temperature=0.0)

    b = ContinuousBatcher(cfg, params, slots=1, prompt_len=8,
                          max_new_tokens=2, eos_token_id=-1,
                          temperature=0.0, dtype=jnp.float32)
    with pytest.raises(ValueError, match="vocab_size"):
        b.run([{"input_ids": ids, "attention_mask": mask,
                "position_ids": pos, "deltas": deltas}])


def test_decode_knob_validation():
    """Typos in decode_impl/decode_quant must raise, not silently fall
    back to the XLA/bf16 paths (a benchmark would measure nothing); an
    explicit 'flash' with Mosaic-illegal geometry must fail with a clear
    message at the library boundary, not deep in kernel lowering."""
    import pytest

    from spacer_tpu.models.qwen25_vl import init_params, tiny_config
    from spacer_tpu.sampler import Sampler
    from spacer_tpu.serving import ContinuousBatcher

    cfg = tiny_config()
    with pytest.raises(ValueError, match="decode_impl"):
        Sampler(cfg, decode_impl="falsh")
    with pytest.raises(ValueError, match="decode_quant"):
        Sampler(cfg, decode_quant="int4")

    params = init_params(jax.random.key(0), cfg, jnp.float32)
    ids = np.full((1, 4), 7, np.int32)
    mask = np.ones((1, 4), np.int32)
    pos = np.broadcast_to(np.arange(4)[None, None], (3, 1, 4)).astype(
        np.int32)
    deltas = np.zeros((1, 1), np.int32)

    # tiny cfg has head_dim != 128: explicit flash is Mosaic-illegal
    s = Sampler(cfg, eos_token_id=-1, length_bucket=8, decode_impl="flash")
    with pytest.raises(ValueError, match="head_dim 128"):
        s.generate(ids, mask, params, position_ids=pos, deltas=deltas,
                   num_generations=1, max_new_tokens=2, temperature=0.0)

    with pytest.raises(ValueError, match="decode_impl"):
        ContinuousBatcher(cfg, params, slots=1, prompt_len=8,
                          max_new_tokens=2, eos_token_id=-1,
                          temperature=0.0, dtype=jnp.float32,
                          decode_impl="falsh")
    with pytest.raises(ValueError, match="decode_quant"):
        ContinuousBatcher(cfg, params, slots=1, prompt_len=8,
                          max_new_tokens=2, eos_token_id=-1,
                          temperature=0.0, dtype=jnp.float32,
                          decode_quant="int4")
