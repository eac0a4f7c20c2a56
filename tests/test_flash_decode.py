"""Flash-decode kernel (ops/flash_decode.py): unit parity in interpret
mode, dead-bucket invariance, and full decode-loop parity of the
head-major layout path against the einsum path.

The Pallas program itself runs on CPU via interpret=True (Mosaic tiling
is validated separately on real TPU hardware; see ROADMAP).  The
"flash_ref" sampler impl exercises every layout/plumbing change
(head-major caches, scale shapes, bucket grow/shrink on axis 2, tail_len
threading) with XLA math, so a CPU pass + the on-chip kernel parity run
covers the whole path.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spacer_tpu.ops.flash_decode import (
    decode_attention_reference,
    flash_decode_attention,
)
from spacer_tpu.ops.quant import quantize_kv


def _inputs(B=2, Hkv=2, G=3, group_q=2, Dh=128, P=256, T=128, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda shape: jnp.asarray(rng.normal(size=shape), jnp.float32)
    q = mk((B, Hkv, G * group_q, Dh))
    pk, pv = mk((B, Hkv, P, Dh)), mk((B, Hkv, P, Dh))
    tk, tv = mk((B * G, Hkv, T, Dh)), mk((B * G, Hkv, T, Dh))
    mask = np.ones((B, P))
    mask[0, : P // 3] = 0  # left padding on prompt 0
    bias = jnp.asarray(np.where(mask, 0, -1e30)[:, None, :], jnp.float32)
    kw = dict(group=G, group_q=group_q, sm_scale=Dh**-0.5)
    return q, pk, pv, tk, tv, bias, kw


def test_kernel_matches_reference_interpret():
    q, pk, pv, tk, tv, bias, kw = _inputs()
    for step in (1, 37, 128):
        ref = decode_attention_reference(q, pk, pv, bias, tk, tv, step, **kw)
        out = flash_decode_attention(q, pk, pv, bias, tk, tv, step,
                                     interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_kernel_int8_matches_reference_interpret():
    q, pk, pv, tk, tv, bias, kw = _inputs()
    pkq, pks = quantize_kv(pk)
    pvq, pvs = quantize_kv(pv)
    tkq, tks = quantize_kv(tk)
    tvq, tvs = quantize_kv(tv)
    r = lambda s: s[:, :, None, :]
    step = 37
    ref = decode_attention_reference(
        q, pkq, pvq, bias, tkq, tvq, step,
        r(pks), r(pvs), r(tks), r(tvs), **kw)
    out = flash_decode_attention(
        q, pkq, pvq, bias, tkq, tvq, step,
        r(pks), r(pvs), r(tks), r(tvs), interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # quantization error vs the unquantized oracle stays small
    oracle = decode_attention_reference(q, pk, pv, bias, tk, tv, step, **kw)
    assert float(jnp.max(jnp.abs(out - oracle))) < 0.05


def test_dead_tail_bucket_is_never_read():
    """Positions >= step must not influence the output even when filled
    with garbage — the kernel's clamped tail index map and validity mask
    guarantee dead bucket space is inert."""
    q, pk, pv, tk, tv, bias, kw = _inputs()
    step = 33
    out = flash_decode_attention(q, pk, pv, bias, tk, tv, step,
                                 interpret=True, **kw)
    tk2 = tk.at[:, :, step:, :].set(1e9)
    tv2 = tv.at[:, :, step:, :].set(-1e9)
    out2 = flash_decode_attention(q, pk, pv, bias, tk2, tv2, step,
                                  interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


@pytest.mark.parametrize("decode_quant", [None, "int8_kv"])
def test_decode_loop_head_major_matches_einsum(decode_quant):
    """Greedy full-loop parity: the head-major flash layout (flash_ref =
    identical math via XLA) must reproduce the einsum path's sequences
    exactly, across bucket growth, int8 KV, and left-padded prompts."""
    from spacer_tpu.models.qwen25_vl import get_rope_index, init_params
    from spacer_tpu.models.qwen25_vl.config import (
        Qwen25VLConfig, TextConfig, VisionConfig,
    )
    from spacer_tpu.sampler import Sampler

    cfg = Qwen25VLConfig(
        text=TextConfig(
            vocab_size=256, hidden_size=256, intermediate_size=512,
            num_layers=2, num_heads=2, num_kv_heads=1,
            mrope_section=(32, 48, 48),
        ),
        vision=VisionConfig(depth=1, fullatt_block_indexes=(0,),
                            out_hidden_size=256),
        image_token_id=250, video_token_id=251,
        vision_start_token_id=252, vision_end_token_id=253,
    )
    assert cfg.text.head_dim == 128
    params = jax.jit(lambda k: init_params(k, cfg, jnp.float32))(
        jax.random.key(0))
    B, S = 2, 160
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 200, (B, S))
    mask = np.ones((B, S), np.int64)
    mask[0, :30] = 0
    ids[0, :30] = 0
    pos, deltas = get_rope_index(cfg, ids, attention_mask=mask)

    outs = {}
    for impl in ("xla", "flash_ref"):
        sampler = Sampler(cfg, eos_token_id=-1, pad_token_id=0,
                          decode_quant=decode_quant, decode_impl=impl)
        outs[impl] = sampler.generate(
            ids, mask, params, position_ids=pos, deltas=deltas,
            num_generations=2, max_new_tokens=160,  # crosses the 128 bucket
            temperature=0.0, top_p=1.0, seed=7,
        )
    np.testing.assert_array_equal(outs["xla"].sequences,
                                  outs["flash_ref"].sequences)


def test_ragged_kernel_matches_reference_interpret():
    """Serving ring variant (ops/flash_decode.py _ragged_kernel): interpret
    parity for bf16 + int8 under random per-row prefix/ring masks."""
    from spacer_tpu.ops.flash_decode import (
        flash_ragged_decode_attention,
        ragged_decode_attention_reference,
    )

    R, Hkv, gq, Dh = 8, 2, 4, 128
    P, T = 256, 128
    rng = np.random.default_rng(0)
    mk = lambda s: jnp.asarray(rng.normal(size=s), jnp.float32)
    q = mk((R, Hkv, gq, Dh))
    pk, pv = mk((R, Hkv, P, Dh)), mk((R, Hkv, P, Dh))
    tk, tv = mk((R, Hkv, T, Dh)), mk((R, Hkv, T, Dh))
    pm = rng.integers(0, 2, (R, P)).astype(bool)
    pm[:, :8] = True
    rm = rng.integers(0, 2, (R, T)).astype(bool)
    rm[:, 0] = True
    bp = jnp.asarray(np.where(pm, 0, -1e30)[:, None, :], jnp.float32)
    bt = jnp.asarray(np.where(rm, 0, -1e30)[:, None, :], jnp.float32)
    kw = dict(group_q=gq, sm_scale=Dh**-0.5)
    ref = ragged_decode_attention_reference(q, pk, pv, bp, tk, tv, bt, **kw)
    out = flash_ragged_decode_attention(q, pk, pv, bp, tk, tv, bt,
                                        interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    pkq, pks = quantize_kv(pk)
    pvq, pvs = quantize_kv(pv)
    tkq, tks = quantize_kv(tk)
    tvq, tvs = quantize_kv(tv)
    r4 = lambda s: s[:, :, None, :]
    ref2 = ragged_decode_attention_reference(
        q, pkq, pvq, bp, tkq, tvq, bt,
        r4(pks), r4(pvs), r4(tks), r4(tvs), **kw)
    out2 = flash_ragged_decode_attention(
        q, pkq, pvq, bp, tkq, tvq, bt,
        r4(pks), r4(pvs), r4(tks), r4(tvs), interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=2e-5, rtol=2e-5)


def test_batcher_head_major_aria_family():
    """The head-major (flash-layout) ring layer is family-generic: Aria's
    MoE feed-forward dispatches through the shared _mlp_block, and
    flash_ref greedy outputs match the einsum path exactly."""
    from spacer_tpu.models.aria.config import tiny_aria_config
    from spacer_tpu.models.aria.model import init_params as aria_init
    from spacer_tpu.models.registry import aria_positions
    from spacer_tpu.serving import ContinuousBatcher

    cfg = tiny_aria_config()
    params = aria_init(jax.random.key(0), cfg, jnp.float32)
    rng = np.random.RandomState(5)
    reqs = []
    for S in [5, 9, 7]:
        ids = rng.randint(10, cfg.text.vocab_size, size=(1, S)).astype(
            np.int32)
        mask = np.ones((1, S), np.int32)
        pos3, deltas = aria_positions(cfg, ids, mask)
        reqs.append({"input_ids": ids, "attention_mask": mask,
                     "position_ids": pos3, "deltas": deltas})
    outs = {}
    for impl in ("xla", "flash_ref"):
        b = ContinuousBatcher(
            cfg, params, slots=2, prompt_len=16, max_new_tokens=6,
            eos_token_id=-1, temperature=0.0, chunk_steps=3,
            dtype=jnp.float32, decode_impl=impl)
        outs[impl] = b.run(reqs)
    for a, b_ in zip(outs["xla"], outs["flash_ref"]):
        np.testing.assert_array_equal(a.sequences[:a.length],
                                      b_.sequences[:a.length])


@pytest.mark.parametrize("decode_quant", [None, "int8_kv"])
def test_batcher_head_major_matches_einsum(decode_quant):
    """Continuous batcher with the flash (head-major) cache layout must
    reproduce the einsum path's outputs exactly — through admission waves,
    slot refill and the ring writes (flash_ref = identical XLA math)."""
    from spacer_tpu.models.qwen25_vl import tiny_config, init_params
    from spacer_tpu.serving import ContinuousBatcher
    from tests.test_serving import _prompts

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    reqs = _prompts(cfg, [4, 7, 10, 5, 9, 6])
    outs = {}
    for impl in ("xla", "flash_ref"):
        b = ContinuousBatcher(
            cfg, params, slots=2, prompt_len=16, max_new_tokens=12,
            eos_token_id=-1, temperature=0.0, chunk_steps=3,
            dtype=jnp.float32, decode_quant=decode_quant,
            decode_impl=impl)
        outs[impl] = b.run(reqs)
    for a, b_ in zip(outs["xla"], outs["flash_ref"]):
        assert a.length == b_.length
        np.testing.assert_array_equal(a.sequences[:a.length],
                                      b_.sequences[:a.length])


def test_auto_resolution_prefers_flash_on_tpu(monkeypatch):
    """auto (decode_impl=None) resolves to the fused kernel exactly when
    (a) the backend is real TPU, (b) the geometry passes the Mosaic
    legality gate — XLA otherwise.  Pinned so
    the measured-best default (chip_measure_decode 2026-08-18: grouped
    kernel 1.07x int8 / 1.13x bf16; headline bench 6.27 -> 6.63 sps)
    can't silently regress to the einsum path."""
    from spacer_tpu.models.qwen25_vl.config import (
        Qwen25VLConfig, TextConfig, VisionConfig,
    )
    from spacer_tpu.sampler import Sampler
    import spacer_tpu.sampler.sampler as sampler_mod

    cfg = Qwen25VLConfig(
        text=TextConfig(
            vocab_size=256, hidden_size=256, intermediate_size=512,
            num_layers=2, num_heads=2, num_kv_heads=1,
            mrope_section=(32, 48, 48),
        ),
        vision=VisionConfig(depth=1, fullatt_block_indexes=(0,),
                            out_hidden_size=256),
        image_token_id=250, video_token_id=251,
        vision_start_token_id=252, vision_end_token_id=253,
    )
    assert cfg.text.head_dim == 128  # legality precondition of the gate
    s = Sampler(cfg, eos_token_id=-1, pad_token_id=0)

    # on the CPU test backend auto must stay XLA (Mosaic can't run)
    assert s._resolve_decode_impl(prompt_bucket=256,
                                  max_new_tokens=128) is None

    monkeypatch.setattr(sampler_mod.jax, "default_backend", lambda: "tpu")
    assert s._resolve_decode_impl(
        prompt_bucket=256, max_new_tokens=128) == "flash"
    # illegal tail bucket (not a 128-multiple) falls back
    assert s._resolve_decode_impl(
        prompt_bucket=256, max_new_tokens=96) is None
    # explicit requests always win over auto
    assert Sampler(cfg, decode_impl="xla")._resolve_decode_impl(
        prompt_bucket=256, max_new_tokens=128) is None
    assert Sampler(cfg, decode_impl="flash_ref")._resolve_decode_impl(
        prompt_bucket=256, max_new_tokens=128) == "flash_ref"
