"""Flash attention kernel parity vs the XLA reference (values + gradients),
run in Pallas interpret mode on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spacer_tpu.nn.attention import xla_attention
from spacer_tpu.ops.flash_attention import flash_attention


def _rand(shape, key):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


@pytest.mark.parametrize("causal", [False, True])
def test_forward_parity(causal):
    B, S, H, D = 2, 256, 4, 64
    q = _rand((B, S, H, D), 0)
    k = _rand((B, S, H, D), 1)
    v = _rand((B, S, H, D), 2)
    ref = xla_attention(q, k, v, causal=causal)
    out = flash_attention(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_gqa_and_kv_mask():
    B, S, Hq, Hkv, D = 2, 256, 4, 2, 64
    q = _rand((B, S, Hq, D), 0)
    k = _rand((B, S, Hkv, D), 1)
    v = _rand((B, S, Hkv, D), 2)
    kv_mask = np.ones((B, S), bool)
    kv_mask[0, :17] = False  # left padding
    kv_mask[1, :50] = False
    ref = xla_attention(q, k, v, causal=True, kv_mask=jnp.asarray(kv_mask))
    out = flash_attention(q, k, v, causal=True, kv_mask=jnp.asarray(kv_mask),
                          interpret=True)
    # rows whose kv are fully masked under causal+padding can differ (they
    # are padding rows); compare only valid rows
    valid = np.asarray(kv_mask)
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[valid], rtol=1e-5, atol=1e-5
    )


def test_forward_segments():
    """Block-diagonal (ViT-window-like) attention via segment ids."""
    B, S, H, D = 1, 256, 2, 64
    q = _rand((B, S, H, D), 0)
    k = _rand((B, S, H, D), 1)
    v = _rand((B, S, H, D), 2)
    segs = jnp.asarray(
        np.repeat(np.arange(4), 64)[None].repeat(B, axis=0)
    )
    ref = xla_attention(q, k, v, q_segment_ids=segs, kv_segment_ids=segs)
    out = flash_attention(q, k, v, q_segment_ids=segs, kv_segment_ids=segs,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_q_offset_decode_chunk():
    """Chunked prefill: q block sits at offset inside the kv window."""
    B, Sq, Skv, H, D = 1, 128, 256, 2, 64
    q = _rand((B, Sq, H, D), 0)
    k = _rand((B, Skv, H, D), 1)
    v = _rand((B, Skv, H, D), 2)
    ref = xla_attention(q, k, v, causal=True, q_offset=128)
    out = flash_attention(q, k, v, causal=True, q_offset=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_gradient_parity(causal):
    B, S, Hq, Hkv, D = 1, 256, 4, 2, 64
    q = _rand((B, S, Hq, D), 0)
    k = _rand((B, S, Hkv, D), 1)
    v = _rand((B, S, Hkv, D), 2)
    kv_mask = np.ones((B, S), bool)
    kv_mask[0, :13] = False
    kv_mask = jnp.asarray(kv_mask)

    # real usage: padding rows receive zero upstream gradient (the loss is
    # completion-masked), so mask them here too.  For fully-masked rows the
    # two implementations legitimately differ (XLA backprops through a
    # uniform softmax over NEG_INF logits; the kernel zeroes masked probs).
    valid = kv_mask[:, :, None, None].astype(jnp.float32)

    def loss_ref(q, k, v):
        o = xla_attention(q, k, v, causal=causal, kv_mask=kv_mask)
        return jnp.sum(jnp.sin(o) * valid)  # nonlinear reduce

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=causal, kv_mask=kv_mask,
                            interpret=True)
        return jnp.sum(jnp.sin(o) * valid)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_out, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"d{name}",
        )


def test_dispatcher_fallback_for_decode():
    from spacer_tpu.nn.attention import dot_product_attention

    B, Skv, H, D = 2, 128, 4, 64
    q = _rand((B, 1, H, D), 0)
    k = _rand((B, Skv, H, D), 1)
    v = _rand((B, Skv, H, D), 2)
    out = dot_product_attention(q, k, v, causal=False, impl="pallas")
    ref = xla_attention(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
