"""Aria vision tower (Idefics3/SigLIP ViT) and perceiver projector.

Behavioral reference: transformers modeling_idefics3.py
(Idefics3VisionEmbeddings :104-166 — NaViT-style bucketed position
embeddings; Idefics3VisionAttention :193-257; Idefics3VisionMLP :259-272;
Idefics3EncoderLayer :286-320; Idefics3VisionTransformer :449-518) and
modeling_aria.py (AriaCrossAttention :93-146, AriaProjector :149-208,
AriaProjectorMLP :66-90).

TPU-first choices:
- the stride-p conv patch embedding is a host-free reshape + one MXU
  matmul over (N, Hp*Wp, p*p*C);
- the data-dependent bucketed position ids (a python loop over the batch
  in HF) are computed ONCE on the host per image geometry
  (`vision_position_ids`) and passed in as an integer array — the jitted
  forward stays static-shaped;
- encoder layers are stacked on a leading layer axis and scanned;
- Aria reads the tower at vision_feature_layer=-1, which in HF indexes the
  recorded per-layer hidden states: the LAST ENCODER LAYER OUTPUT, before
  post_layernorm (modeling_aria.py get_image_features :941-975).
  `vit_forward` therefore returns the pre-post_layernorm features.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from spacer_tpu.models.aria.config import AriaConfig, AriaVisionConfig
from spacer_tpu.nn.attention import dot_product_attention
from spacer_tpu.nn.core import (
    dense,
    dense_init,
    embed_init,
    layer_norm,
    layer_norm_init,
)

Params = Any


def init_vit_params(key, cfg: AriaVisionConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 8)
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    P = cfg.num_patches_per_side ** 2
    patch_dim = cfg.num_channels * cfg.patch_size ** 2

    def stack_init(fn, key, *args, **kw):
        ks = jax.random.split(key, L)
        return jax.tree.map(
            lambda *xs: jnp.stack(xs), *[fn(k, *args, **kw) for k in ks]
        )

    def stack_ln():
        return {
            "scale": jnp.ones((L, D), dtype),
            "bias": jnp.zeros((L, D), dtype),
        }

    return {
        "embeddings": {
            "patch_embedding": dense_init(keys[0], patch_dim, D, True, dtype),
            "position_embedding": embed_init(keys[1], P, D, dtype),
        },
        "encoder": {
            "layer_norm1": stack_ln(),
            "layer_norm2": stack_ln(),
            "self_attn": {
                "q_proj": stack_init(dense_init, keys[2], D, D, True, dtype),
                "k_proj": stack_init(dense_init, keys[3], D, D, True, dtype),
                "v_proj": stack_init(dense_init, keys[4], D, D, True, dtype),
                "out_proj": stack_init(dense_init, keys[5], D, D, True, dtype),
            },
            "mlp": {
                "fc1": stack_init(dense_init, keys[6], D, I, True, dtype),
                "fc2": stack_init(dense_init, keys[7], I, D, True, dtype),
            },
        },
        "post_layernorm": layer_norm_init(D, dtype),
    }


def vision_position_ids(nb_patches_h: int, nb_patches_w: int,
                        cfg: AriaVisionConfig,
                        max_h: int | None = None,
                        max_w: int | None = None) -> np.ndarray:
    """Bucketed NaViT position ids for one image (host-side, static).

    Replicates Idefics3VisionEmbeddings.forward:135-165: fractional patch
    coordinates over the VALID (unpadded) grid are bucketized into the
    pretrained num_patches_per_side grid.  Padded slots (beyond
    nb_patches_h/w inside the max grid) get id 0 — they are masked out of
    attention and never read.
    """
    side = cfg.num_patches_per_side
    max_h = max_h or nb_patches_h
    max_w = max_w or nb_patches_w
    boundaries = np.arange(1 / side, 1.0, 1 / side)
    frac_h = np.arange(nb_patches_h) / nb_patches_h * (1 - 1e-6)
    frac_w = np.arange(nb_patches_w) / nb_patches_w * (1 - 1e-6)
    bucket_h = np.searchsorted(boundaries, frac_h, side="right")
    bucket_w = np.searchsorted(boundaries, frac_w, side="right")
    ids = np.zeros((max_h, max_w), np.int32)
    ids[:nb_patches_h, :nb_patches_w] = (
        bucket_h[:, None] * side + bucket_w[None, :]
    )
    return ids.reshape(-1)


def patchify(pixel_values, patch_size: int):
    """(N, H, W, C) -> (N, Hp*Wp, p*p*C) rows in conv-sliding order.

    Row feature order is (dy, dx, c) — the loader permutes the HF conv
    kernel to match.
    """
    N, H, W, C = pixel_values.shape
    p = patch_size
    x = pixel_values.reshape(N, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (N, Hp, Wp, p, p, C)
    return x.reshape(N, (H // p) * (W // p), p * p * C)


def _vit_layer(h, lp, *, eps, kv_mask, num_heads):
    N, S, D = h.shape
    Dh = D // num_heads
    x = layer_norm(lp["layer_norm1"], h, eps)
    attn = lp["self_attn"]
    q = dense(attn["q_proj"], x).reshape(N, S, num_heads, Dh)
    k = dense(attn["k_proj"], x).reshape(N, S, num_heads, Dh)
    v = dense(attn["v_proj"], x).reshape(N, S, num_heads, Dh)
    o = dot_product_attention(q, k, v, kv_mask=kv_mask)
    h = h + dense(attn["out_proj"], o.reshape(N, S, D))

    x = layer_norm(lp["layer_norm2"], h, eps)
    x = dense(lp["mlp"]["fc1"], x)
    x = jax.nn.gelu(x, approximate=True)  # gelu_pytorch_tanh
    h = h + dense(lp["mlp"]["fc2"], x)
    return h


def vit_forward(params: Params, cfg: AriaVisionConfig, pixel_values,
                position_ids, patch_mask=None, remat: bool = False):
    """Run the tower.  pixel_values (N, H, W, C) f32/bf16 in [-1, 1]
    (SigLIP normalization happens in preprocessing); position_ids
    (N, Hp*Wp) int32 from `vision_position_ids`; patch_mask (N, Hp*Wp)
    bool (True = real patch).

    Returns (last_layer_hidden, post_layernormed): the former feeds the
    projector (HF vision_feature_layer=-1 semantics), the latter is the
    tower's official last_hidden_state.
    """
    patches = patchify(pixel_values, cfg.patch_size)
    h = dense(params["embeddings"]["patch_embedding"], patches)
    pos = jnp.take(params["embeddings"]["position_embedding"]["embedding"],
                   position_ids, axis=0)
    h = h + pos

    def body(h, lp):
        fn = _vit_layer
        if remat:
            fn = jax.checkpoint(
                lambda hh, ll: _vit_layer(
                    hh, ll, eps=cfg.layer_norm_eps, kv_mask=patch_mask,
                    num_heads=cfg.num_heads,
                )
            )
            return fn(h, lp), None
        return fn(h, lp, eps=cfg.layer_norm_eps, kv_mask=patch_mask,
                  num_heads=cfg.num_heads), None

    h, _ = jax.lax.scan(body, h, params["encoder"])
    return h, layer_norm(params["post_layernorm"], h, cfg.layer_norm_eps)


# ---------------------------------------------------------------------------
# Projector (AriaProjector): learned queries cross-attend to patch features.
# ---------------------------------------------------------------------------


def init_projector_params(key, cfg: AriaConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 8)
    Dv = cfg.vision.hidden_size
    Dt = cfg.text.hidden_size
    Q = cfg.max_projector_queries
    return {
        "query": (jax.random.truncated_normal(keys[0], -2.0, 2.0, (Q, Dv))
                  * 0.02).astype(dtype),
        "cross_attn": {
            "q_proj": dense_init(keys[1], Dv, Dv, False, dtype),
            "k_proj": dense_init(keys[2], Dv, Dv, False, dtype),
            "v_proj": dense_init(keys[3], Dv, Dv, False, dtype),
            # torch nn.MultiheadAttention applies its own packed input
            # projection on top of q/k/v_proj (an Aria quirk kept for
            # checkpoint parity): in_proj (Dv, 3Dv), out_proj (Dv, Dv).
            "mha_in_proj": dense_init(keys[4], Dv, 3 * Dv, True, dtype),
            "mha_out_proj": dense_init(keys[5], Dv, Dv, True, dtype),
            "linear": dense_init(keys[6], Dv, Dv, True, dtype),
            "layer_norm": layer_norm_init(Dv, dtype),
            "layer_norm_kv": layer_norm_init(Dv, dtype),
        },
        "layer_norm": layer_norm_init(Dv, dtype),
        "feed_forward": {
            "linear_in": dense_init(keys[7], Dv, Dt, False, dtype),
            "linear_out": dense_init(
                jax.random.fold_in(key, 7), Dt, Dt, False, dtype),
        },
    }


def projector_forward(params: Params, cfg: AriaConfig, features,
                      patch_mask=None):
    """features (N, Np, Dv) -> (N, Q, Dt), Q = patch_to_query[Np].

    Mirrors AriaProjector.forward + AriaCrossAttention.forward: queries are
    layer-normed then double-projected (q_proj, then the MHA in-proj); keys
    and values are layer-normed once, then double-projected likewise.
    """
    N, Np, Dv = features.shape
    num_heads = cfg.vision.num_heads
    Dh = Dv // num_heads
    query_num = cfg.patch_to_query.get(Np)
    if query_num is None:
        raise KeyError(
            f"Number of patches {Np} not in patch_to_query "
            f"{sorted(cfg.patch_to_query)}"
        )
    p = params["cross_attn"]
    queries = jnp.broadcast_to(
        params["query"][None, :query_num], (N, query_num, Dv)
    ).astype(features.dtype)

    # projector norms are plain nn.LayerNorm (torch default eps 1e-5),
    # unlike the tower's config-driven 1e-6
    eps = 1e-5
    q = dense(p["q_proj"], layer_norm(p["layer_norm"], queries, eps))
    kv = layer_norm(p["layer_norm_kv"], features, eps)
    k = dense(p["k_proj"], kv)
    v = dense(p["v_proj"], kv)

    in_k = p["mha_in_proj"]["kernel"]
    in_b = p["mha_in_proj"]["bias"]
    q = jnp.dot(q, in_k[:, :Dv]) + in_b[:Dv]
    k = jnp.dot(k, in_k[:, Dv:2 * Dv]) + in_b[Dv:2 * Dv]
    v = jnp.dot(v, in_k[:, 2 * Dv:]) + in_b[2 * Dv:]

    attn = dot_product_attention(
        q.reshape(N, query_num, num_heads, Dh),
        k.reshape(N, Np, num_heads, Dh),
        v.reshape(N, Np, num_heads, Dh),
        kv_mask=patch_mask,
    ).reshape(N, query_num, Dv)
    attn = dense(p["mha_out_proj"], attn)
    attn = dense(p["linear"], attn)

    out = layer_norm(params["layer_norm"], attn, eps)
    ff = params["feed_forward"]
    out = dense(ff["linear_in"], out)
    out = jax.nn.gelu(out, approximate=True)  # gelu_new
    return dense(ff["linear_out"], out)
