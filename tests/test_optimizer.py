"""Optimizer moment-storage numerics: f32 reference behavior, the bf16
freeze failure mode, and the 8-bit blockwise+stochastic-rounding moments.

Reference: torch.optim.AdamW (HF Trainer default) keeps exp_avg/exp_avg_sq
in f32 regardless of param dtype; the bitsandbytes dep (setup.py:44) is the
reference stack's 8-bit-optimizer option."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from spacer_tpu.train.optimizer import (
    _quantize_block_sr,
    make_optimizer,
    scale_by_adam_8bit,
    scale_by_adam_f32,
)


def test_bf16_nu_freezes_f32_does_not():
    """The failure mode that motivates the f32 default: with b2=0.999 the
    per-step nu increment is ~2^-10 of nu, below bf16's 8 mantissa bits,
    so a warm bf16 nu stops absorbing gradient-scale changes."""
    g = jnp.float32(1e-3)
    steps = 200
    nu_f32, nu_bf16 = jnp.float32(1e-6), jnp.bfloat16(1e-6)
    # constant g^2 = 1e-6 equals the starting nu: f32 stays exactly (EMA
    # fixed point); then g DOUBLES — nu must rise toward 4e-6
    for _ in range(steps):
        nu_f32 = 0.999 * nu_f32 + 0.001 * (2 * g) ** 2
        nu_bf16 = (0.999 * nu_bf16.astype(jnp.float32)
                   + 0.001 * (2 * g) ** 2).astype(jnp.bfloat16)
    target = 4e-6 - 3e-6 * 0.999 ** steps  # exact EMA value
    assert abs(float(nu_f32) / target - 1) < 1e-4
    # bf16 absorbed strictly less of the change (rounding loses increments)
    assert float(nu_bf16) < float(nu_f32) * 0.95


def test_sr_quantize_unbiased():
    """E[dequant(quantize_sr(x))] == x even when x is far below one
    quantization step (the property that keeps 8-bit EMA sound)."""
    key = jax.random.key(0)
    # block absmax 1.0 -> step = 1/127; test value 100x smaller
    x = jnp.full((1, 2048), 1 / 12700.0, jnp.float32).at[0, 0].set(1.0)
    acc = 0.0
    n = 50
    for i in range(n):
        q, s = _quantize_block_sr(x, jax.random.fold_in(key, i), signed=True)
        acc += float(q[0, 1:].astype(jnp.float32).mean()) * float(s[0, 0])
    mean = acc / n  # ~100k draws of the sub-step value
    assert abs(mean / (1 / 12700.0) - 1) < 0.05  # unbiased within MC noise

    # plain rounding would freeze this value at exactly 0 forever
    q, s = _quantize_block_sr(x, key, signed=True, sr=False)
    assert not q[0, 1:].any()


def test_adam8bit_matches_f32_direction():
    """First-step direction is identical (moments start at 0); later steps
    stay close (quantization noise is bounded by the block scale)."""
    key = jax.random.key(1)
    params = {"w": jax.random.normal(key, (64, 64)) * 0.1,
              "b": jnp.zeros((7,))}  # non-multiple-of-block size
    t8 = scale_by_adam_8bit()
    tf = scale_by_adam_f32()
    s8, sf = t8.init(params), tf.init(params)
    for i in range(5):
        g = jax.tree.map(
            lambda p, i=i: jax.random.normal(
                jax.random.fold_in(key, i * 7 + p.size), p.shape) * 0.01,
            params)
        u8, s8 = t8.update(g, s8, params)
        uf, sf = tf.update(g, sf, params)
        cos = float(
            sum(jnp.vdot(a, b) for a, b in zip(
                jax.tree_util.tree_leaves(u8),
                jax.tree_util.tree_leaves(uf)))
            / (optax.global_norm(u8) * optax.global_norm(uf)))
        assert cos > 0.99, (i, cos)


@pytest.mark.parametrize("moment_dtype", ["float32", "int8"])
def test_training_trajectory_parity(moment_dtype):
    """A short noisy-quadratic training run: int8 moments track the f32
    trajectory; both converge (loss decreases)."""
    def loss_fn(p, x):
        return jnp.mean((x @ p["w"] - jnp.sin(x.sum(1, keepdims=True))) ** 2)

    key = jax.random.key(2)
    p0 = {"w": jax.random.normal(key, (16, 1)) * 0.5}
    tx = make_optimizer(learning_rate=3e-2, total_steps=100,
                        schedule="constant", max_grad_norm=1e9,
                        weight_decay=0.0, moment_dtype=moment_dtype)
    p, st = dict(p0), tx.init(p0)
    losses = []
    for i in range(60):
        x = jax.random.normal(jax.random.fold_in(key, i), (32, 16))
        loss, g = jax.value_and_grad(loss_fn)(p, x)
        u, st = tx.update(g, st, p)
        p = optax.apply_updates(p, u)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < 0.25 * np.mean(losses[:5]), losses[:: 10]


def test_int8_trajectory_close_to_f32():
    """Same data order, same init: the int8 param trajectory stays within a
    few percent (relative) of the f32 one over 40 steps."""
    def loss_fn(p, x):
        return jnp.mean((x @ p["w"]) ** 2) + jnp.mean(jnp.abs(p["w"]))

    key = jax.random.key(3)
    p0 = {"w": jax.random.normal(key, (32, 8))}
    runs = {}
    for md in ("float32", "int8"):
        tx = make_optimizer(learning_rate=1e-2, total_steps=100,
                            schedule="constant", weight_decay=0.0,
                            moment_dtype=md)
        p, st = dict(p0), tx.init(p0)
        for i in range(40):
            x = jax.random.normal(jax.random.fold_in(key, 100 + i), (16, 32))
            _, g = jax.value_and_grad(loss_fn)(p, x)
            u, st = tx.update(g, st, p)
            p = optax.apply_updates(p, u)
        runs[md] = p["w"]
    rel = float(jnp.linalg.norm(runs["int8"] - runs["float32"])
                / jnp.linalg.norm(runs["float32"] - p0["w"]))
    assert rel < 0.10, rel


def test_adam8bit_no_denominator_blowup():
    """The hazard that rules out LINEAR nu quantization: elements whose
    second moment rounds to ~0 get direction m/(sqrt(0)+eps) ~ 1e5x.  The
    log map bounds |direction| near the f32 bound at every step."""
    key = jax.random.key(4)
    params = {"w": jax.random.normal(key, (64, 64)) * 0.1}
    t8, tf = scale_by_adam_8bit(), scale_by_adam_f32()
    s8, sf = t8.init(params), tf.init(params)
    for i in range(8):
        # heavy-tailed grads: many tiny elements next to huge ones in the
        # same quantization block (the worst case for absmax maps)
        z = jax.random.normal(jax.random.fold_in(key, i), (64, 64))
        g = {"w": jnp.sign(z) * jnp.exp(3.0 * jnp.abs(z)) * 1e-4}
        u8, s8 = t8.update(g, s8, params)
        uf, sf = tf.update(g, sf, params)
        m8 = float(jnp.abs(u8["w"]).max())
        mf = float(jnp.abs(uf["w"]).max())
        # Residual excess is mu's SR noise floor over the clamped-up
        # denominator floor: bounded at ~(mu_absmax/254)/sqrt(1e-6*vmax)
        # (~5x here, ~1x for non-adversarial blocks); the linear-nu
        # catastrophe this guards against measured ~500x.
        assert m8 < 20.0 * mf + 1e-3, (i, m8, mf)


def test_adam8bit_nu_tracks_upward_scale_change():
    """Deterministic log rounding has a ~5% deadband, but a gradient-scale
    JUMP must cross it immediately (one large g^2 re-anchors the block)."""
    t8 = scale_by_adam_8bit()
    params = {"w": jnp.zeros((256,))}
    s8 = t8.init(params)
    for i in range(20):
        u8, s8 = t8.update({"w": jnp.full((256,), 1e-3)}, s8, params)
    # 10x gradient scale: v must reach ~the new fixed point within the EMA
    # horizon, not freeze at the old one
    for i in range(60):
        u8, s8 = t8.update({"w": jnp.full((256,), 1e-2)}, s8, params)
    from spacer_tpu.train.optimizer import _dequant_nu_log
    v = float(_dequant_nu_log(s8.nu_q["w"], s8.nu_s["w"])
              .reshape(-1)[:256].mean())  # drop block padding slots
    # exact EMA after 20@1e-3 + 60@1e-2: dominated by the 1e-4 target
    assert v > 1e-4 * (1 - 0.999 ** 60) * 0.8, v


def test_8bit_state_memory():
    """State payload is ~2.6 bytes/param (vs 8 for f32)."""
    params = {"w": jnp.zeros((4096, 512), jnp.bfloat16)}
    tx = scale_by_adam_8bit()
    st = tx.init(params)
    payload = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(st)
        if hasattr(leaf, "dtype") and leaf.dtype != jnp.float32
    )
    scales = sum(
        leaf.size * 4
        for leaf in jax.tree_util.tree_leaves((st.mu_s, st.nu_s)))
    n = 4096 * 512
    # slack covers count + the PRNG key (the default rbg key is 4 uint32
    # words vs threefry's 2)
    assert payload <= 2 * n + 32
    assert scales <= 4 * n // 512


def test_make_optimizer_moment_dtypes():
    params = {"w": jnp.ones((8, 8), jnp.bfloat16)}
    for md, want in (("float32", jnp.float32), ("bfloat16", jnp.bfloat16)):
        tx = make_optimizer(moment_dtype=md)
        st = tx.init(params)
        mus = [leaf for leaf in jax.tree_util.tree_leaves(st)
               if hasattr(leaf, "shape") and leaf.shape == (8, 8)]
        assert any(leaf.dtype == want for leaf in mus), (md, mus)
