"""On-chip decode-kernel measurement (run on the real TPU, foreground).

Resolves the queued hardware questions from ROADMAP item 12:
  (a) restructured grouped flash-decode kernel vs the XLA einsum path
      (bench shapes, int8_kv, step=700, fori_loop-amortized);
  (b) serving-ring kernel vs its XLA reference (serving shapes);
  (c) numerical parity of both kernels on-chip (Mosaic legality included
      — interpret mode does not enforce tiling).

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/chip_measure_decode.py

Decision rule (applied to Sampler._resolve_decode_impl /
ContinuousBatcher auto): flip auto to "flash" only where the kernel
wins its microbench by >5%.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from spacer_tpu.ops.flash_decode import (
    decode_attention_reference,
    flash_decode_attention,
    flash_ragged_decode_attention,
    ragged_decode_attention_reference,
)
from spacer_tpu.ops.quant import quantize_kv

print("backend:", jax.default_backend(), jax.devices(), flush=True)
assert jax.default_backend() == "tpu", "run this on the real chip"


def loop_time(fn, q0, n=200, warm=2):
    """Time n chained calls inside ONE jit (relay dispatch amortized)."""

    @jax.jit
    def run():
        def body(i, q):
            o = fn(q)
            return q + o.astype(q.dtype) * 1e-6
        return jax.lax.fori_loop(0, n, body, q0)

    for _ in range(warm):
        r = run()
    float(jnp.sum(r))
    t0 = time.perf_counter()
    r = run()
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / n * 1e6  # us/call


def grouped(quant=True):
    B, Hkv, G, group_q, Dh = 8, 4, 8, 4, 128
    GQ = G * group_q
    P, T = 2048, 1024
    rng = np.random.default_rng(0)
    mk = lambda s: jnp.asarray(rng.normal(size=s), jnp.bfloat16)
    q0 = mk((B, Hkv, GQ, Dh))
    pk, pv = mk((B, Hkv, P, Dh)), mk((B, Hkv, P, Dh))
    tk, tv = mk((B * G, Hkv, T, Dh)), mk((B * G, Hkv, T, Dh))
    mask = np.ones((B, P))
    mask[0, :100] = 0
    bias = jnp.asarray(np.where(mask, 0, -1e30)[:, None, :], jnp.float32)
    kw = dict(group=G, group_q=group_q, sm_scale=Dh ** -0.5)
    steps = jnp.int32(700)
    if quant:
        pk, pks = quantize_kv(pk)
        pv, pvs = quantize_kv(pv)
        tk, tks = quantize_kv(tk)
        tv, tvs = quantize_kv(tv)
        r = lambda s: s[:, :, None, :]
        extra = (r(pks), r(pvs), r(tks), r(tvs))
    else:
        extra = ()

    ker = lambda q: flash_decode_attention(
        q, pk, pv, bias, tk, tv, steps, *extra, **kw)
    ref = lambda q: decode_attention_reference(
        q, pk, pv, bias, tk, tv, steps, *extra, **kw)

    # parity first (also proves Mosaic legality of the restructured grid)
    o_k, o_r = ker(q0), ref(q0)
    err = float(jnp.max(jnp.abs(o_k - o_r)))
    tag = "int8" if quant else "bf16"
    print(f"grouped[{tag}] max abs err: {err:.5f}", flush=True)
    assert err < 5e-2, err
    t_k = loop_time(ker, q0)
    t_r = loop_time(ref, q0)
    print(f"grouped[{tag}]: kernel {t_k:.1f} us/call  xla {t_r:.1f} us/call "
          f"({t_r / t_k:.2f}x)", flush=True)


def ragged(quant=True):
    R, Hkv, gq, Dh = 8, 4, 4, 128
    P, T = 2048, 1024
    rng = np.random.default_rng(1)
    mk = lambda s: jnp.asarray(rng.normal(size=s), jnp.bfloat16)
    q0 = mk((R, Hkv, gq, Dh))
    pk, pv = mk((R, Hkv, P, Dh)), mk((R, Hkv, P, Dh))
    tk, tv = mk((R, Hkv, T, Dh)), mk((R, Hkv, T, Dh))
    pm = rng.integers(0, 2, (R, P)).astype(bool)
    pm[:, :8] = True
    rm = rng.integers(0, 2, (R, T)).astype(bool)
    rm[:, 0] = True
    bp = jnp.asarray(np.where(pm, 0, -1e30)[:, None, :], jnp.float32)
    bt = jnp.asarray(np.where(rm, 0, -1e30)[:, None, :], jnp.float32)
    kw = dict(group_q=gq, sm_scale=Dh ** -0.5)
    if quant:
        pk, pks = quantize_kv(pk)
        pv, pvs = quantize_kv(pv)
        tk, tks = quantize_kv(tk)
        tv, tvs = quantize_kv(tv)
        r = lambda s: s[:, :, None, :]
        extra = (r(pks), r(pvs), r(tks), r(tvs))
    else:
        extra = ()

    ker = lambda q: flash_ragged_decode_attention(
        q, pk, pv, bp, tk, tv, bt, *extra, **kw)
    ref = lambda q: ragged_decode_attention_reference(
        q, pk, pv, bp, tk, tv, bt, *extra, **kw)

    o_k, o_r = ker(q0), ref(q0)
    err = float(jnp.max(jnp.abs(o_k - o_r)))
    tag = "int8" if quant else "bf16"
    print(f"ragged[{tag}] max abs err: {err:.5f}", flush=True)
    assert err < 5e-2, err
    t_k = loop_time(ker, q0)
    t_r = loop_time(ref, q0)
    print(f"ragged[{tag}]: kernel {t_k:.1f} us/call  xla {t_r:.1f} us/call "
          f"({t_r / t_k:.2f}x)", flush=True)


if __name__ == "__main__":
    import sys

    parts = sys.argv[1:] or ["gq", "g", "rq", "r"]
    if "gq" in parts:
        grouped(quant=True)
    if "g" in parts:
        grouped(quant=False)
    if "rq" in parts:
        ragged(quant=True)
    if "r" in parts:
        ragged(quant=False)
    print("done", flush=True)
