"""Packed-int4 decode weights (ops/int4_matmul.py + ops/quant.py int4).

Pins: pack/unpack roundtrip, kernel-vs-reference parity (interpret mode —
the CPU suite cannot enforce Mosaic tiling, so the real-chip sweep
re-checks on TPU), rank-1 quantization error bounds, dense dispatch, and
the tiny-model generate e2e under decode_quant="int4_kv".

Role parity: vLLM's int4 weight-only serving modes (AWQ/GPTQ class) in
the reference's rollout-engine role (vllm_grpo_trainer_modified.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spacer_tpu.ops.int4_matmul import (
    int4_matmul,
    int4_matmul_reference,
    pack_int4,
    unpack_int4,
)
from spacer_tpu.ops.quant import dense_q4, quantize_dense_int4


@pytest.mark.parametrize("K,N", [(256, 128), (1024, 384), (64, 32)])
def test_pack_unpack_roundtrip(K, N):
    rng = np.random.default_rng(0)
    codes = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
    packed = np.asarray(pack_int4(jnp.asarray(codes)))
    assert packed.shape == (K // 2, N) and packed.dtype == np.int8
    back = np.asarray(unpack_int4(jnp.asarray(packed), K))
    np.testing.assert_array_equal(back, codes)


def test_pack_unpack_stacked_layers():
    rng = np.random.default_rng(1)
    codes = rng.integers(-8, 8, size=(3, 512, 128)).astype(np.int8)
    back = np.asarray(unpack_int4(pack_int4(jnp.asarray(codes)), 512))
    np.testing.assert_array_equal(back, codes)


@pytest.mark.parametrize("M,K,N", [(8, 256, 128), (16, 2048, 512)])
def test_kernel_matches_reference(M, K, N):
    """The Pallas kernel (interpret mode on CPU) and the XLA reference
    compute the same product: identical bf16 operands, f32 accumulation."""
    rng = np.random.default_rng(2)
    codes = rng.integers(-7, 8, size=(K, N)).astype(np.int8)
    packed = pack_int4(jnp.asarray(codes))
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32),
                    jnp.bfloat16)
    got = np.asarray(int4_matmul(x, packed, interpret=True))
    want = np.asarray(int4_matmul_reference(x, packed))
    # K-blocked f32 accumulation reorders the sums vs the one-dot
    # reference: agreement to ~1e-4 relative, not bit-exact
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-3)
    # and both match the plain integer matmul in f32
    exact = np.asarray(x, np.float32) @ codes.astype(np.float32)
    np.testing.assert_allclose(got, exact, rtol=2e-2, atol=0.5)


def test_quantize_dense_int4_error_bound():
    """Rank-1-scaled int4 on gaussian weights: relative RMS error well
    under the level where the rollout A/B would even be worth running if
    it failed (int8 sits at ~0.4%; int4 lands ~5-10%)."""
    rng = np.random.default_rng(3)
    w = rng.normal(size=(512, 256)).astype(np.float32) * 0.02
    p = quantize_dense_int4({"kernel": jnp.asarray(w)})
    codes = np.asarray(unpack_int4(p["kernel_q4"], 512), np.float32)
    deq = (codes * np.asarray(p["q4_row_scale"])[:, None]
           * np.asarray(p["q4_col_scale"])[None, :])
    rel = np.linalg.norm(deq - w) / np.linalg.norm(w)
    # gaussian is int4's worst case (no outlier structure for the rank-1
    # scales to absorb): step = colmax/7 ~ 0.47 sigma -> RMS ~ 13%
    assert rel < 0.15, rel
    # codes stay in the symmetric int4 range
    assert codes.min() >= -7 and codes.max() <= 7


def test_dense_q4_dispatch_and_output():
    """nn.core.dense must route kernel_q4 dicts through dense_q4, and the
    quantized product must approximate the bf16 product."""
    from spacer_tpu.nn.core import dense

    rng = np.random.default_rng(4)
    w = rng.normal(size=(256, 128)).astype(np.float32) * 0.05
    b = rng.normal(size=(128,)).astype(np.float32) * 0.01
    x = jnp.asarray(rng.normal(size=(4, 3, 256)).astype(np.float32),
                    jnp.bfloat16)
    p = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    y_full = np.asarray(dense(p, x), np.float32)
    q = quantize_dense_int4(p)
    assert "bias" in q
    y_q = np.asarray(dense(q, x), np.float32)
    assert y_q.shape == y_full.shape
    rel = np.linalg.norm(y_q - y_full) / np.linalg.norm(y_full)
    assert rel < 0.15, rel
    # idempotent re-quantization
    assert quantize_dense_int4(q) is q


def test_dense_q4_odd_rows_pad():
    """M not a multiple of 8 pads internally and slices back."""
    rng = np.random.default_rng(5)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(3, 64)).astype(np.float32),
                    jnp.bfloat16)
    q = quantize_dense_int4({"kernel": jnp.asarray(w)})
    y = dense_q4(q, x)
    assert y.shape == (3, 32)
    ref = np.asarray(x, np.float32) @ w
    rel = np.linalg.norm(np.asarray(y, np.float32) - ref
                         ) / np.linalg.norm(ref)
    assert rel < 0.2, rel


@pytest.mark.parametrize("quant", ["int4", "int4_kv"])
def test_generate_int4_e2e(quant):
    """Tiny-model grouped rollout under int4 decode quant: runs, emits
    in-vocab tokens, and the G completions of a group share their
    prompt."""
    from spacer_tpu.models.qwen25_vl import init_params, tiny_config
    from spacer_tpu.sampler import Sampler

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    B, S, G, C = 2, 16, 2, 8
    rng = np.random.RandomState(0)
    ids = rng.randint(10, cfg.text.vocab_size, size=(B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    pos = np.broadcast_to(np.arange(S)[None, None], (3, B, S)).astype(
        np.int32)
    deltas = np.zeros((B, 1), np.int32)
    s = Sampler(cfg, eos_token_id=-1, pad_token_id=0, length_bucket=8,
                decode_quant=quant)
    out = s.generate(ids, mask, params, position_ids=pos, deltas=deltas,
                     num_generations=G, max_new_tokens=C, temperature=0.0,
                     seed=0)
    assert out.sequences.shape == (B * G, C)
    assert (out.sequences >= 0).all()
    assert (out.sequences < cfg.text.vocab_size).all()
    # greedy + shared prompt -> all G rows of a group are identical
    for b in range(B):
        rows = out.sequences[b * G:(b + 1) * G]
        assert (rows == rows[0]).all()


def test_sampler_rejects_unknown_quant():
    from spacer_tpu.models.qwen25_vl import tiny_config
    from spacer_tpu.sampler import Sampler

    with pytest.raises(ValueError, match="decode_quant"):
        Sampler(tiny_config(), eos_token_id=-1, pad_token_id=0,
                decode_quant="int2")
