"""Pallas fused windowed-attention ViT path vs the XLA path.

The TPU-default vit_forward route (attn_impl=None on TPU, or "pallas"
anywhere) runs qkv/proj in the kernel-native padded (H, S, 128) layout with
rotate_half_matrix rope and the window/chunk Pallas kernels. On CPU the
kernels run in interpret mode; outputs and parameter gradients must match
the XLA path.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl.config import VisionConfig
from spacer_tpu.models.qwen25_vl.vision import (
    init_vit_params,
    vision_layout,
    vit_forward,
)


def _cfg():
    return VisionConfig(
        depth=4, hidden_size=64, intermediate_size=128, num_heads=4,
        fullatt_block_indexes=(2,), out_hidden_size=48, window_size=112,
    )


# (8,12) windows divide evenly in merge units (vws=4); (6,10) is ragged
@pytest.mark.parametrize("grids", [
    (((2, 8, 12),),),
    (((2, 6, 10),),),
    (((2, 6, 10), (2, 8, 8)),),
])
def test_kernel_path_matches_xla(grids):
    (grid_thw,) = grids
    cfg = _cfg()
    layout = vision_layout(grid_thw, cfg)
    params = init_vit_params(jax.random.key(0), cfg, jnp.float32)
    S = layout.seq_len
    px = jnp.asarray(
        np.random.default_rng(0).normal(size=(S, cfg.patch_dim))
    ).astype(jnp.float32)

    out_xla = vit_forward(params, cfg, px, layout, attn_impl="xla")
    out_ker = vit_forward(params, cfg, px, layout, attn_impl="pallas")
    np.testing.assert_allclose(
        np.asarray(out_ker), np.asarray(out_xla), rtol=2e-4, atol=2e-5
    )


def test_kernel_path_gradients_match_xla():
    grid_thw = ((2, 6, 10),)
    cfg = _cfg()
    layout = vision_layout(grid_thw, cfg)
    params = init_vit_params(jax.random.key(1), cfg, jnp.float32)
    S = layout.seq_len
    px = jnp.asarray(
        np.random.default_rng(1).normal(size=(S, cfg.patch_dim))
    ).astype(jnp.float32)

    def loss(params, impl):
        out = vit_forward(params, cfg, px, layout, attn_impl=impl)
        return (out * out).mean()

    g_xla = jax.grad(lambda p: loss(p, "xla"))(params)
    g_ker = jax.grad(lambda p: loss(p, "pallas"))(params)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(g_xla)
    flat_k = jax.tree.leaves(g_ker)
    for (path, gx), gk in zip(flat_x, flat_k):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gx), rtol=5e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_kernel_path_with_remat():
    grid_thw = ((2, 8, 8),)
    cfg = _cfg()
    layout = vision_layout(grid_thw, cfg)
    params = init_vit_params(jax.random.key(2), cfg, jnp.float32)
    S = layout.seq_len
    px = jnp.asarray(
        np.random.default_rng(2).normal(size=(S, cfg.patch_dim))
    ).astype(jnp.float32)
    out = vit_forward(params, cfg, px, layout, attn_impl="pallas",
                      remat=True)
    ref = vit_forward(params, cfg, px, layout, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )
