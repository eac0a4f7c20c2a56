"""Pipeline parallelism (GPipe schedule) for the LM decoder stack.

The reference stack has no pipeline parallelism (SURVEY §2.3: absent);
this is the TPU-native supply for scaling past what fsdp/tp fit on one
slice.  The design leans on two facts of this codebase:

- decoder layer parameters are STACKED on a leading (L, ...) axis and
  iterated with lax.scan (models/qwen25_vl/language.py:37-71), so
  sharding that axis over a `pipe` mesh axis IS the stage partition —
  no per-stage parameter surgery, each device holds L/S contiguous
  layers as its shard of the same pytree;
- a layer is a pure h -> h function given (cos, sin, kv_mask), so the
  pipelined payload is just (h microbatch) with its rope/mask slices
  prefetched to every stage.

Schedule: classic GPipe over M microbatches and S stages inside ONE
shard_map program.  lax.scan runs M+S-1 ticks; each tick every stage

  1. receives its predecessor's activation via ppermute (stage 0
     ingests fresh microbatch t instead),
  2. runs its local layers (inner lax.scan over the (L/S, ...) shard),
  3. hands the result forward on the next tick.

Bubble ticks (stage s idle while t-s is out of [0, M)) compute garbage
on zeros and are masked out of the output — the SPMD cost model
(everyone executes the same program) makes that unavoidable and it is
exactly the (S-1)/(M+S-1) bubble fraction of any GPipe implementation.

The whole schedule is differentiable (ppermute's transpose is the
reverse ppermute; the tick scan checkpoints per tick, and `remat=True`
additionally rematerializes each layer), so a GRPO/SFT train step jits
directly over a `pipe` mesh axis — see test_pipeline.py and the
dryrun gate's pp leg.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from spacer_tpu.models.qwen25_vl.config import TextConfig


def pipeline_param_spec(axis: str = "pipe"):
    """PartitionSpec for the stacked decoder-layer pytree: shard the
    leading layer axis over the pipe mesh axis, replicate the rest."""
    return P(axis)


def shard_layers_for_pipeline(params, mesh, axis: str = "pipe"):
    """Place the LM param dict for pipeline_lm_forward: `layers` sharded
    on the stacked layer axis over `axis`, everything else replicated."""
    spec = pipeline_param_spec(axis)
    out = {}
    for name, sub in params.items():
        s = spec if name == "layers" else P()
        out[name] = jax.tree.map(
            lambda x, s=s: jax.device_put(x, NamedSharding(mesh, s)), sub,
        )
    return out


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "axis", "num_microbatches", "causal",
                     "remat", "logits", "batch_axis"),
)
def pipeline_lm_forward(
    params,
    cfg: TextConfig,
    mesh,
    *,
    axis: str = "pipe",
    num_microbatches: int,
    input_ids=None,           # (B, T)
    input_embeds=None,        # (B, T, D)
    position_ids=None,        # (3, B, T)
    kv_mask=None,             # (B, T)
    causal: bool = True,
    remat: bool = True,
    logits: bool = True,
    batch_axis: str | None = None,
):
    """Full-sequence LM forward with the decoder stack pipelined over
    `mesh.shape[axis]` stages.  Returns logits (B, T, V) (or hidden
    states with logits=False); numerics match lm_forward exactly.

    B must divide into num_microbatches; cfg.num_layers into the stage
    count.  `params["layers"]` should be sharded P(axis) on the layer
    axis (shard_layers_for_pipeline) — under jit the partitioner honors
    whatever placement the operands carry.

    batch_axis composes pp with dp: microbatch rows shard over that mesh
    axis (each (pipe, data) device runs the same schedule on its slice of
    every microbatch; layer shards are replicated across data).
    """
    from spacer_tpu.models.qwen25_vl.language import _layer, _remat_wrap
    from spacer_tpu.nn.core import dense, embed, rms_norm
    from spacer_tpu.nn.rope import mrope_cos_sin, rope_inv_freq

    if input_embeds is None:
        input_embeds = embed(params["embed_tokens"], input_ids)
    B, T, D = input_embeds.shape
    M = num_microbatches
    S = mesh.shape[axis]
    L = cfg.num_layers
    assert B % M == 0, f"batch {B} not divisible into {M} microbatches"
    assert L % S == 0, f"{L} layers not divisible into {S} stages"
    mb = B // M

    if position_ids is None:
        position_ids = jnp.broadcast_to(
            jnp.arange(T)[None, None, :], (3, B, T))
    if kv_mask is None:
        kv_mask = jnp.ones((B, T), bool)
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta)
    cos, sin = mrope_cos_sin(position_ids, inv_freq, cfg.mrope_section)

    as_mb = lambda x: x.reshape(M, mb, *x.shape[1:])  # noqa: E731
    h_mbs = as_mb(input_embeds)
    cos_mbs = as_mb(cos)
    sin_mbs = as_mb(sin)
    mask_mbs = as_mb(kv_mask)

    perm = [(i, (i + 1) % S) for i in range(S)]

    def layer_body(h, lp, cos_m, sin_m, mask_m):
        h, _ = _layer(
            h, lp, None, cfg=cfg, cos=cos_m, sin=sin_m, kv_mask=mask_m,
            causal=causal, cache_index=0, attn_impl=None,
        )
        return h

    # same remat policy semantics as every other forward path: False /
    # True / "dots" / "dots_narrow" all route through _remat_wrap (a bare
    # `if remat:` would silently degrade the string policies to full
    # per-layer recompute)
    layer_body = _remat_wrap(layer_body, remat, cfg)

    def stage_fn(local_layers, h_mbs, cos_mbs, sin_mbs, mask_mbs):
        s = jax.lax.axis_index(axis)
        mb_local = h_mbs.shape[1]   # rows per device (mb / dp shard)

        def tick(carry, t):
            state, outputs = carry
            # hand-off: every stage sends its last output forward; stage 0
            # ingests the fresh microbatch for this tick instead
            prev = jax.lax.ppermute(state, axis, perm)
            m = t - s                      # microbatch on this stage now
            mc = jnp.clip(m, 0, M - 1)
            fresh = h_mbs[jnp.clip(t, 0, M - 1)]
            x_in = jnp.where(s == 0, fresh, prev)
            cos_m = cos_mbs[mc]
            sin_m = sin_mbs[mc]
            mask_m = mask_mbs[mc]

            def body(h, lp):
                return layer_body(h, lp, cos_m, sin_m, mask_m), None

            y, _ = jax.lax.scan(body, x_in, local_layers)
            active = (m >= 0) & (m < M)
            y = jnp.where(active, y, jnp.zeros_like(y))
            # the LAST stage banks finished microbatches
            take = active & (s == S - 1)
            outputs = outputs.at[mc].set(
                jnp.where(take, y, outputs[mc]))
            return (y, outputs), None

        state0 = jnp.zeros((mb_local, T, D), h_mbs.dtype)
        out0 = jnp.zeros((M, mb_local, T, D), h_mbs.dtype)
        (_, outputs), _ = jax.lax.scan(
            tick, (state0, out0), jnp.arange(M + S - 1))
        # only the last stage holds real data; psum replicates it so the
        # (tiny relative to a train step) head can run unsharded
        return jax.lax.psum(outputs, axis)

    mb_spec = P(None, batch_axis)   # (M, mb, ...): rows shard over dp
    in_specs = (
        P(axis),   # stacked layers -> (L/S, ...) per stage
        mb_spec, mb_spec, mb_spec, mb_spec,
    )
    h_out = jax.shard_map(
        stage_fn, mesh=mesh, in_specs=in_specs, out_specs=mb_spec,
        check_vma=False,
    )(params["layers"], h_mbs, cos_mbs, sin_mbs, mask_mbs)

    h = h_out.reshape(B, T, D)
    h = rms_norm(params["norm"], h, cfg.rms_norm_eps)
    if not logits:
        return h
    if cfg.tie_word_embeddings:
        return jnp.dot(h, params["embed_tokens"]["embedding"].T)
    return dense(params["lm_head"], h)
