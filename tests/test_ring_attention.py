"""Ring attention vs the single-device reference (values and gradients) on
the 8-virtual-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from spacer_tpu.nn.attention import xla_attention
from spacer_tpu.ops.ring_attention import make_ring_attention
from spacer_tpu.parallel import create_mesh


def _inputs(B=2, S=256, H=4, Hkv=2, D=32):
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, Hkv, D), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_reference(causal):
    mesh = create_mesh({"data": 1, "fsdp": 8, "tp": 1})
    q, k, v = _inputs()
    kv_mask = np.ones((2, 256), bool)
    kv_mask[0, :9] = False
    kv_mask = jnp.asarray(kv_mask)

    ring = make_ring_attention(mesh, "fsdp", causal=causal)
    seq_sharding = NamedSharding(mesh, P(None, "fsdp", None, None))
    qs, ks_, vs = (jax.device_put(x, seq_sharding) for x in (q, k, v))

    out = jax.jit(ring)(qs, ks_, vs, kv_mask)
    ref = xla_attention(q, k, v, causal=causal, kv_mask=kv_mask)
    valid = np.asarray(kv_mask)
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[valid], rtol=2e-5, atol=2e-5
    )


def test_ring_attention_gradients():
    mesh = create_mesh({"data": 1, "fsdp": 8, "tp": 1})
    q, k, v = _inputs()
    ring = make_ring_attention(mesh, "fsdp", causal=True)

    def loss_ring(q, k, v):
        return jnp.sum(jnp.sin(ring(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(xla_attention(q, k, v, causal=True)))

    g_ring = jax.jit(jax.grad(loss_ring, (0, 1, 2)))(q, k, v)
    g_ref = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"d{name}",
        )
