"""Optimizer: AdamW + cosine schedule + global-norm clipping.

Reference hyperparameters (run_SpaceR_SG_RLVR.sh:23-25, 37 and HF Trainer
defaults): lr 1e-6, cosine decay to 0 with linear warmup, weight decay 0.01,
max_grad_norm 5, adam betas (0.9, 0.999) eps 1e-8.

Moment storage (`moment_dtype`):
  "float32"  — the reference behavior (torch.optim.AdamW keeps f32 exp_avg/
               exp_avg_sq regardless of param dtype).  DEFAULT.
  "bfloat16" — optax's param-dtype default for bf16 params.  UNSOUND for
               long runs: with b2=0.999 the per-step increment
               (1-b2)*(g^2 - nu) is ~2^-10 of nu, below bf16's 8 mantissa
               bits, so nu freezes once warm (tests/test_optimizer.py
               demonstrates).  Kept only as an explicit opt-in.
  "int8"     — blockwise-quantized moments (the bitsandbytes 8-bit-Adam
               role, setup.py:44): int8/uint8 payload + one f32 scale per
               2048-element block = ~2.6 bytes/param of optimizer state vs
               8 for f32.  Update math is f32 (dequant -> adam -> requant,
               fused by XLA).  Trajectory parity vs f32 is pinned by
               tests/test_optimizer.py.

               Numerics (each storage format chosen for its EMA horizon):
               * mu (b1=0.9, ~10-step horizon): LINEAR absmax map with
                 stochastic rounding.  SR keeps the EMA unbiased; the
                 rounding noise random-walk is damped by sqrt(1/(1-b1^2))
                 ~ 2.3x, i.e. ~0.3% of block absmax — negligible.
               * nu (b2=0.999, ~1000-step horizon): LOG map (relative
                 precision over [1e-6, 1] x block max) with DETERMINISTIC
                 nearest rounding.  Two hazards rule the alternatives out:
                 linear quantization rounds small v to 0 and the Adam
                 denominator 1/(sqrt(v)+eps) turns that into ~1e5x
                 per-element update blow-ups; SR at b2=0.999 amplifies
                 round-off into a sqrt(1/(1-b2^2)) ~ 22x random walk
                 (~±47% instantaneous error in v).  The log map bounds
                 relative error at ±2.8% for every magnitude (no blow-up;
                 sub-range values clamp UP, which safely shrinks the
                 update), and deterministic rounding makes the error
                 absorbing instead of accumulating.  The cost, shared with
                 bitsandbytes' dynamic map: a ~5% relative deadband, so v
                 tracks upward gradient-scale changes immediately (one
                 large g^2 crosses the band) but lags slow decays — an
                 effective per-element LR decay, benign for Adam.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

BLOCK = 2048


def _quantize_block_sr(x, key, *, signed: bool, sr: bool = True):
    """x: (nb, BLOCK) f32 -> (payload int8/uint8, scale f32 (nb, 1)).

    Symmetric linear per-block absmax quantization; stochastic rounding
    (dither in [-0.5, 0.5)) keeps E[dequant(quantize(x))] == x.
    """
    lim = 127.0 if signed else 255.0
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-30) / lim
    y = x / scale
    if sr:
        dither = jax.random.uniform(key, x.shape, jnp.float32) - 0.5
        y = y + dither
    y = jnp.clip(jnp.round(y), -lim if signed else 0.0, lim)
    payload = y.astype(jnp.int8 if signed else jnp.uint8)
    return payload, scale


# nu log map: payload p in [0,255] represents scale * exp(LOG_RMIN * (1 -
# p/255)); relative step exp(-LOG_RMIN/255) - 1 ~ 5.6%, so nearest rounding
# is within ±2.8% at every magnitude across 6 decades.
LOG_RMIN = -13.815510557964274  # log(1e-6)


def _quantize_nu_log(v):
    """v: (nb, BLOCK) f32 >= 0 -> (uint8 payload, f32 scale (nb, 1)).

    Deterministic nearest rounding in log domain (see module docstring for
    why not SR / not linear).  Values below 1e-6 * blockmax clamp UP to the
    range floor — the denominator can only grow, never vanish.
    """
    scale = jnp.max(v, axis=1, keepdims=True)
    r = v / jnp.maximum(scale, 1e-38)
    u = jnp.log(jnp.maximum(r, 1e-6)) / LOG_RMIN  # in [0, 1]; 0 == blockmax
    payload = jnp.clip(jnp.round((1.0 - u) * 255.0), 0.0, 255.0)
    return payload.astype(jnp.uint8), scale


def _dequant_nu_log(payload, scale):
    u = LOG_RMIN * (1.0 - payload.astype(jnp.float32) / 255.0)
    return scale * jnp.exp(u)


def _to_blocks(x):
    flat = x.reshape(-1).astype(jnp.float32)
    pad = (-flat.size) % BLOCK
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(-1, BLOCK)


def _from_blocks(blocks, shape, size):
    return blocks.reshape(-1)[:size].reshape(shape)


class ScaleByAdam8bitState(NamedTuple):
    count: jnp.ndarray  # int32 step counter
    key: jnp.ndarray    # PRNG key for stochastic rounding
    mu_q: object        # pytree of int8 (nb, BLOCK)
    mu_s: object        # pytree of f32 (nb, 1)
    nu_q: object        # pytree of uint8 (nb, BLOCK)
    nu_s: object        # pytree of f32 (nb, 1)


def scale_by_adam_8bit(b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-8, seed: int = 0,
                       sr_impl: str | None = None):
    """Adam moment tracking with blockwise int8 moments + SR.

    Drop-in for optax.scale_by_adam: update(grads) -> adam direction
    m_hat / (sqrt(v_hat) + eps); the moments round-trip through int8
    payloads between steps.

    sr_impl selects the mu stochastic-rounding dither source (env
    SPACER_ADAM8_SR when None):
      "rbg"      — jax's unsafe_rbg hardware generator (DEFAULT): unbiased
                   uniform dither at a fraction of threefry's ALU cost.
                   The "unsafe" caveats (weaker split/fold_in
                   independence) are irrelevant for rounding dither.
                   Measured v5e at 1.3B (2026-08-19): 79.2 ms/apply vs
                   threefry 88.6 (f32 moments: 70.8).
      "threefry" — jax's default counter RNG; ~13 rounds of 32-bit ops
                   per 2 dither values on the VPU.  Kept for bit-level
                   reproducibility against older runs.
      "off"      — deterministic nearest rounding for mu (up to 0.5 LSB =
                   ~0.4% of block absmax bias per step; the 10-step b1
                   horizon bounds accumulation).  Fastest.
    """
    import os

    if sr_impl is None:
        sr_impl = {"0": "off", "": None}.get(
            os.environ.get("SPACER_ADAM8_SR", ""),
            os.environ.get("SPACER_ADAM8_SR")) or "rbg"
    if sr_impl not in ("threefry", "rbg", "off"):
        raise ValueError(f"unknown sr_impl {sr_impl!r}")

    def init_fn(params):
        def q0(p, signed):
            nb = -(-p.size // BLOCK)
            payload = jnp.zeros((nb, BLOCK),
                                jnp.int8 if signed else jnp.uint8)
            scale = jnp.zeros((nb, 1), jnp.float32)
            return payload, scale

        mu = jax.tree.map(lambda p: q0(p, True), params)
        nu = jax.tree.map(lambda p: q0(p, False), params)
        # tree-of-tuples -> tuple-of-trees
        mu_q = jax.tree.map(lambda t: t[0], mu,
                            is_leaf=lambda t: isinstance(t, tuple))
        mu_s = jax.tree.map(lambda t: t[1], mu,
                            is_leaf=lambda t: isinstance(t, tuple))
        nu_q = jax.tree.map(lambda t: t[0], nu,
                            is_leaf=lambda t: isinstance(t, tuple))
        nu_s = jax.tree.map(lambda t: t[1], nu,
                            is_leaf=lambda t: isinstance(t, tuple))
        key = (jax.random.key(seed, impl="unsafe_rbg")
               if sr_impl == "rbg" else jax.random.key(seed))
        return ScaleByAdam8bitState(
            count=jnp.zeros([], jnp.int32),
            key=key,
            mu_q=mu_q, mu_s=mu_s, nu_q=nu_q, nu_s=nu_s,
        )

    def update_fn(updates, state, params=None):
        count = state.count + 1
        key = jax.random.fold_in(state.key, count)
        leaves, treedef = jax.tree_util.tree_flatten(updates)
        keys = jax.random.split(key, 2 * len(leaves))

        mu_q = treedef.flatten_up_to(state.mu_q)
        mu_s = treedef.flatten_up_to(state.mu_s)
        nu_q = treedef.flatten_up_to(state.nu_q)
        nu_s = treedef.flatten_up_to(state.nu_s)

        out, n_mu_q, n_mu_s, n_nu_q, n_nu_s = [], [], [], [], []
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        for i, g in enumerate(leaves):
            gb = _to_blocks(g)
            m = mu_q[i].astype(jnp.float32) * mu_s[i]
            v = _dequant_nu_log(nu_q[i], nu_s[i])
            m = b1 * m + (1.0 - b1) * gb
            v = b2 * v + (1.0 - b2) * gb * gb
            direction = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            out.append(_from_blocks(direction, g.shape, g.size)
                       .astype(g.dtype))
            qm, sm = _quantize_block_sr(m, keys[2 * i], signed=True,
                                        sr=sr_impl != "off")
            qv, sv = _quantize_nu_log(v)
            n_mu_q.append(qm)
            n_mu_s.append(sm)
            n_nu_q.append(qv)
            n_nu_s.append(sv)

        new_state = ScaleByAdam8bitState(
            count=count, key=state.key,
            mu_q=treedef.unflatten(n_mu_q), mu_s=treedef.unflatten(n_mu_s),
            nu_q=treedef.unflatten(n_nu_q), nu_s=treedef.unflatten(n_nu_s),
        )
        return treedef.unflatten(out), new_state

    return optax.GradientTransformation(init_fn, update_fn)


def _adamw_8bit(learning_rate, b1, b2, eps, weight_decay, mask, seed=0):
    return optax.chain(
        scale_by_adam_8bit(b1=b1, b2=b2, eps=eps, seed=seed),
        optax.add_decayed_weights(weight_decay, mask=mask),
        optax.scale_by_learning_rate(learning_rate),
    )


def make_optimizer(
    learning_rate: float = 1e-6,
    total_steps: int = 10000,
    warmup_steps: int = 0,
    weight_decay: float = 0.01,
    max_grad_norm: float = 5.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    schedule: str = "cosine",
    moment_dtype: str = "float32",
):
    if schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup_steps else learning_rate,
            peak_value=learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=0.0,
        )
    elif schedule == "constant":
        sched = learning_rate
    else:
        raise ValueError(schedule)

    # HF AdamW does not decay layernorm weights / biases; match by masking
    # one-dimensional params out of the weight-decay term.
    def decay_mask(params):
        import jax

        return jax.tree.map(lambda p: p.ndim > 1, params)

    if moment_dtype == "int8":
        inner = _adamw_8bit(sched, b1, b2, eps, weight_decay, decay_mask)
    elif moment_dtype == "float32":
        inner = _adamw_f32(sched, b1, b2, eps, weight_decay, decay_mask)
    elif moment_dtype == "bfloat16":
        # optax.adamw: mu in mu_dtype, nu in the PARAM dtype — the legacy
        # behavior, kept only as an explicit opt-in (see module docstring)
        inner = optax.adamw(
            sched, b1=b1, b2=b2, eps=eps,
            weight_decay=weight_decay, mask=decay_mask,
            mu_dtype=jnp.bfloat16,
        )
    else:
        raise ValueError(moment_dtype)

    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        inner,
    )


class ScaleByAdamF32State(NamedTuple):
    count: jnp.ndarray
    mu: object
    nu: object


def scale_by_adam_f32(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """Adam with BOTH moments in f32 regardless of param/grad dtype — the
    torch.optim.AdamW reference behavior (optax's scale_by_adam keeps nu in
    the param dtype, which silently freezes for bf16 params; see module
    docstring)."""

    def init_fn(params):
        mu = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        nu = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        return ScaleByAdamF32State(count=jnp.zeros([], jnp.int32),
                                   mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        mu = jax.tree.map(
            lambda m, g: b1 * m + (1.0 - b1) * g.astype(jnp.float32),
            state.mu, updates)
        nu = jax.tree.map(
            lambda v, g: b2 * v
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            state.nu, updates)
        out = jax.tree.map(
            lambda m, v, g: ((m / bc1)
                             / (jnp.sqrt(v / bc2) + eps)).astype(g.dtype),
            mu, nu, updates)
        return out, ScaleByAdamF32State(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _adamw_f32(learning_rate, b1, b2, eps, weight_decay, mask):
    return optax.chain(
        scale_by_adam_f32(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay, mask=mask),
        optax.scale_by_learning_rate(learning_rate),
    )
