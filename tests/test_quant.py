"""Weight-only int8 quantization: numerics and decode integration."""

import numpy as np
import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl import init_params, tiny_config
from spacer_tpu.nn.core import dense, dense_init
from spacer_tpu.ops.quant import (
    dense_q8,
    quantize_dense_int8,
    quantize_tree_int8,
)
from spacer_tpu.sampler import Sampler


def test_quantized_dense_close_to_fp():
    p = dense_init(jax.random.key(0), 64, 96, True)
    x = jax.random.normal(jax.random.key(1), (8, 64))
    ref = dense(p, x)
    q = quantize_dense_int8(p)
    got = dense_q8(q, x)
    # int8 per-channel: RMS error well under 1% of the output RMS
    err = np.asarray(got - ref)
    rms_ratio = np.sqrt((err ** 2).mean()) / np.sqrt(
        (np.asarray(ref) ** 2).mean())
    assert float(rms_ratio) < 0.01, rms_ratio
    # dense() dispatches on the quantized dict transparently
    np.testing.assert_array_equal(np.asarray(dense(q, x)), np.asarray(got))


def test_quantize_tree_skips_router_and_experts():
    from spacer_tpu.ops.moe import init_moe_params

    p = init_moe_params(jax.random.key(0), 16, 8, 4, 1)
    q = quantize_tree_int8(p)
    assert "kernel" in q["router"]          # untouched
    assert "kernel" in q["experts"]["fc1"]  # untouched
    assert "kernel_q8" in q["shared"]["gate_proj"]


def test_int8_decode_matches_bf16_greedy_mostly():
    """Greedy decode with int8 weights: sequences should match the bf16
    decode for a clear-margin model (random tiny weights, fixed prompt)."""
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    ids = np.random.RandomState(0).randint(
        10, cfg.text.vocab_size, size=(2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    pos = np.broadcast_to(np.arange(9)[None, None], (3, 2, 9)).astype(np.int32)
    deltas = np.zeros((2, 1), np.int32)

    outs = {}
    for quant in (None, "int8"):
        s = Sampler(cfg, length_bucket=16, decode_quant=quant)
        outs[quant] = s.generate(
            ids, mask, params, position_ids=pos, deltas=deltas,
            num_generations=1, max_new_tokens=8, temperature=0.0,
        ).sequences
    agree = (outs[None] == outs["int8"]).mean()
    assert agree >= 0.75, (outs[None], outs["int8"])
