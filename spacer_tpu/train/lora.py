"""LoRA adapters over the param pytree.

Behavioral reference: the PEFT-optional path of the reference trainer
(SG_RLVR_trainer.py:200-221, 539-540): adapters train while the base stays
frozen, and the reference policy is the model with adapters DISABLED — so no
separate ref-model copy is needed (a 2x parameter-memory win, exactly the
reference's `disable_adapter()` trick).

Adapters target dense kernels by path regex; each gets a pair
a: (..., in, r), b: (..., r, out) with b zero-initialized so step 0 is a
no-op.  `merge_lora` materializes base + scale * a @ b for the forward pass
(cost ~one extra matmul per targeted kernel, negligible next to a step).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 8
    alpha: int = 16
    target_patterns: tuple = (
        r"model/layers/self_attn/(q|k|v|o)_proj/kernel",
    )

    @property
    def scale(self) -> float:
        return self.alpha / self.r


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def _is_target(path_str: str, cfg: LoraConfig) -> bool:
    return any(re.search(p, path_str) for p in cfg.target_patterns)


def init_lora_params(key, params, cfg: LoraConfig, dtype=None):
    """Returns a sparse pytree: {path pieces mirroring params} with
    {"a","b"} leaves at targeted kernels, None elsewhere."""
    leaves = []

    def build(path, leaf):
        ps = _path_str(path)
        if not _is_target(ps, cfg) or leaf.ndim < 2:
            return None
        k = jax.random.fold_in(key, len(leaves))
        leaves.append(ps)
        *batch, d_in, d_out = leaf.shape
        dt = dtype or leaf.dtype
        a = jax.random.normal(k, (*batch, d_in, cfg.r)) * (d_in ** -0.5)
        b = jnp.zeros((*batch, cfg.r, d_out))
        return {"a": a.astype(dt), "b": b.astype(dt)}

    return jax.tree_util.tree_map_with_path(build, params)


def merge_lora(params, lora, cfg: LoraConfig):
    """base + scale * a @ b at targeted kernels (others pass through).

    Maps over the lora tree (whose leaves are None or {"a","b"} dicts) so
    each leaf pairs with the corresponding base kernel subtree.
    """
    def combine(l, p):
        if l is None:
            return p
        delta = jnp.einsum("...ir,...ro->...io", l["a"], l["b"]) * cfg.scale
        return p + delta.astype(p.dtype)

    return jax.tree.map(
        combine, lora, params,
        is_leaf=lambda x: x is None or (isinstance(x, dict) and "a" in x),
    )


def make_lora_grpo_train_step(
    model_cfg, tx, lora_cfg: LoraConfig, *, beta: float = 0.04,
    remat: bool = True, attn_impl=None, logp_chunk: int = 256,
):
    """GRPO step training only LoRA params; ref logps come from the frozen
    base (adapters disabled), so no reference copy is kept."""
    import functools

    from spacer_tpu.train.grpo import grpo_loss
    from spacer_tpu.train.step import _completion_logps
    from spacer_tpu.models.qwen25_vl.model import encode_vision

    def logps_with(params, batch, grid_thw, num_generations, prompt_len):
        vision_embeds = None
        if grid_thw is not None:
            ve = encode_vision(params, model_cfg, batch["pixel_values"],
                               grid_thw, remat=remat, attn_impl=attn_impl)
            vision_embeds = jnp.tile(ve, (num_generations, 1))
        return _completion_logps(
            params, model_cfg, batch["input_ids"], batch["position_ids"],
            batch["kv_mask"], prompt_len, vision_embeds=vision_embeds,
            remat=remat, attn_impl=attn_impl, logp_chunk=logp_chunk,
        )

    @functools.partial(
        jax.jit,
        static_argnames=("grid_thw", "num_generations", "prompt_len"),
        donate_argnames=("lora", "opt_state"),
    )
    def step(base_params, lora, opt_state, batch, grid_thw=None,
             num_generations: int = 1, prompt_len: int | None = None):
        ref_logps = jax.lax.stop_gradient(
            logps_with(base_params, batch, grid_thw, num_generations,
                       prompt_len)
        )

        def loss_fn(lora):
            merged = merge_lora(base_params, lora, lora_cfg)
            logps = logps_with(merged, batch, grid_thw, num_generations,
                               prompt_len)
            return grpo_loss(
                logps, ref_logps, batch["advantages"],
                batch["completion_mask"], beta=beta,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(lora)
        updates, opt_state = tx.update(grads, opt_state, lora)
        lora = jax.tree.map(lambda p, u: p + u.astype(p.dtype), lora, updates)
        import optax

        metrics = dict(metrics, loss=loss, grad_norm=optax.global_norm(grads))
        return lora, opt_state, metrics

    return step
