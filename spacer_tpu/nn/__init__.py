"""Functional neural-net building blocks (params as plain pytrees).

No module framework: every layer is an `init(key, ...) -> params` plus an
`apply(params, x, ...) -> y` pair, which keeps pjit sharding, surgery and
checkpointing trivial (the param tree is the single source of truth).
"""

from spacer_tpu.nn.core import (
    dense,
    dense_init,
    embed,
    embed_init,
    rms_norm,
    rms_norm_init,
)
from spacer_tpu.nn.rope import (
    rotate_half,
    apply_rope,
    compute_rope_cos_sin,
    apply_mrope,
    mrope_cos_sin,
)
from spacer_tpu.nn.attention import dot_product_attention

__all__ = [
    "dense", "dense_init", "embed", "embed_init", "rms_norm", "rms_norm_init",
    "rotate_half", "apply_rope", "compute_rope_cos_sin", "apply_mrope",
    "mrope_cos_sin", "dot_product_attention",
]
