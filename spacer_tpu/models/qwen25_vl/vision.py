"""Qwen2.5-VL vision transformer (windowed attention, 2x2 patch merger).

Behavioral reference: modeling_qwen2_5_vl.py:306-466 (rot_pos_emb :336,
get_window_index :365, forward :406).  TPU-first split of responsibilities:

- `vision_layout(grid_thw, cfg)` runs ON HOST (numpy, cached per grid): the
  window permutation, its inverse, per-token (h, w) rotary positions and the
  window / frame segment ids. These are data-independent integer arrays —
  exactly the kind of gather bookkeeping XLA should not re-derive on device.
- `vit_forward` runs ON DEVICE with static shapes: one gather to window
  order, scan over stacked blocks with block-diagonal attention expressed as
  segment ids (windowed layers use window ids, full layers frame ids — the
  reference's cu_seqlens in kernel-friendly form), one gather back.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from spacer_tpu.models.qwen25_vl.config import VisionConfig
from spacer_tpu.nn.attention import dot_product_attention
from spacer_tpu.nn.core import (
    dense,
    dense_init,
    layer_norm,
    layer_norm_init,
    quick_gelu,
    rms_norm,
    rms_norm_init,
)
from spacer_tpu.nn.rope import apply_vision_rope, vision_rope_cos_sin

Params = Any


class VisionLayout(NamedTuple):
    """Host-precomputed gather/mask bookkeeping for one grid_thw batch."""

    window_index: np.ndarray      # (S/mu,) merge-unit permutation to window order
    reverse_index: np.ndarray     # (S_merged,) inverse permutation (merged tokens)
    pos_hw: np.ndarray            # (S, 2) patch (h, w) positions, window order
    pos_hw_native: np.ndarray     # (S, 2) positions in the native token order
    window_segments: np.ndarray   # (S,) segment id per token, window order
    full_segments: np.ndarray     # (S,) frame-chunk segment id, window order
    seq_len: int
    # padded-window fast path: each token belongs to exactly one window of at
    # most `win_tokens` tokens; attention inside windows is dense + masked.
    win_gather: np.ndarray        # (n_win, win_tokens) token idx (window order)
    win_valid: np.ndarray         # (n_win, win_tokens) bool
    win_scatter: np.ndarray       # (S,) index into flattened (n_win*win_tokens)
    # uniform frame-chunk fast path for full-attention layers (or 0 if the
    # chunks are ragged and the segment-mask path must be used)
    full_chunk: int


@functools.lru_cache(maxsize=256)
def _vision_layout_cached(grid_thw: tuple, spatial_merge_size: int,
                          patch_size: int, window_size: int) -> VisionLayout:
    m = spatial_merge_size
    mu = m * m
    vws = window_size // m // patch_size  # window edge in merge units

    window_index_parts = []
    pos_parts = []
    win_seg_parts = []
    full_seg_parts = []
    unit_base = 0      # running merge-unit offset
    win_base = 0       # running window id
    frame_base = 0     # running frame-chunk id

    for (t, h, w) in grid_thw:
        lh, lw = h // m, w // m
        # --- window permutation over merge units (get_window_index parity)
        index = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = vws - lh % vws
        pad_w = vws - lw % vws
        nwh = (lh + pad_h) // vws
        nww = (lw + pad_w) // vws
        padded = np.full((t, lh + pad_h, lw + pad_w), -100, dtype=np.int64)
        padded[:, :lh, :lw] = index
        padded = padded.reshape(t, nwh, vws, nww, vws).transpose(0, 1, 3, 2, 4)
        padded = padded.reshape(t, nwh * nww, vws, vws)
        seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)  # per window
        flat = padded.reshape(-1)
        index_new = flat[flat != -100]
        window_index_parts.append(index_new + unit_base)

        # --- window segment ids (token granularity, window order)
        nonzero = seqlens[seqlens > 0]
        win_ids = np.repeat(np.arange(len(seqlens)) + win_base, seqlens * mu)
        win_seg_parts.append(win_ids)
        win_base += len(seqlens)

        # --- full-attention segment ids: one segment per temporal chunk.
        # Window order only permutes within a t-chunk, so chunk membership is
        # preserved: t-th chunk = lh*lw merge units = lh*lw*mu tokens.
        full_ids = np.repeat(np.arange(t) + frame_base, lh * lw * mu)
        full_seg_parts.append(full_ids)
        frame_base += t

        # --- rotary (h, w) positions per token in merge-unit order
        hpos = np.arange(h)[:, None] * np.ones((1, w), np.int64)
        wpos = np.ones((h, 1), np.int64) * np.arange(w)[None, :]

        def to_unit_order(x):
            x = x.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3)
            return x.reshape(-1)

        ph = np.tile(to_unit_order(hpos), t)
        pw = np.tile(to_unit_order(wpos), t)
        pos = np.stack([ph, pw], axis=-1)  # (t*h*w, 2) merge-unit order
        pos_parts.append(pos)
        unit_base += t * lh * lw

    window_index = np.concatenate(window_index_parts)
    pos = np.concatenate(pos_parts, axis=0)
    # reorder rotary positions into window order (token granularity)
    pos_units = pos.reshape(-1, mu, 2)[window_index]
    pos_hw = pos_units.reshape(-1, 2)
    window_segments = np.concatenate(win_seg_parts)
    full_segments = np.concatenate(full_seg_parts)
    reverse_index = np.argsort(window_index)
    S = int(pos_hw.shape[0])

    # --- padded-window gather/scatter (tokens are contiguous per window in
    # window order, so each window is a [start, start+len) slice)
    win_tokens = vws * vws * mu
    # window id per token is non-decreasing; compute starts/lengths
    _, starts, lengths = np.unique(
        window_segments, return_index=True, return_counts=True
    )
    n_win = len(starts)
    slot = np.arange(win_tokens)
    win_gather = starts[:, None] + np.minimum(slot[None, :],
                                              lengths[:, None] - 1)
    win_valid = slot[None, :] < lengths[:, None]
    # each token's (window, slot) in the flattened padded layout
    win_scatter = np.empty(S, np.int64)
    for w in range(n_win):
        win_scatter[starts[w] : starts[w] + lengths[w]] = (
            w * win_tokens + np.arange(lengths[w])
        )

    # --- uniform frame-chunk size for full-attention layers
    _, chunk_counts = np.unique(full_segments, return_counts=True)
    full_chunk = int(chunk_counts[0]) if len(set(chunk_counts)) == 1 else 0

    return VisionLayout(
        window_index=window_index,
        reverse_index=reverse_index,
        pos_hw=pos_hw,
        pos_hw_native=pos,
        window_segments=window_segments,
        full_segments=full_segments,
        seq_len=S,
        win_gather=win_gather,
        win_valid=win_valid,
        win_scatter=win_scatter,
        full_chunk=full_chunk,
    )


def vision_layout(grid_thw, cfg: VisionConfig) -> VisionLayout:
    """grid_thw: iterable of (t, h, w) per image/video (patch units)."""
    key = tuple(tuple(int(v) for v in g) for g in grid_thw)
    return _vision_layout_cached(
        key, cfg.spatial_merge_size, cfg.patch_size, cfg.window_size
    )


def init_vit_params(key, cfg: VisionConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 10)
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.depth
    merged = D * cfg.spatial_merge_unit

    def stack_init(fn, key, *args, **kw):
        ks = jax.random.split(key, L)
        return jax.tree.map(lambda *xs: jnp.stack(xs), *[fn(k, *args, **kw) for k in ks])

    if cfg.arch == "qwen2":
        norm1 = {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)}
        norm2 = {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)}
        mlp = {
            "fc1": stack_init(dense_init, keys[3], D, I, True, dtype),
            "fc2": stack_init(dense_init, keys[5], I, D, True, dtype),
        }
        ln_q = layer_norm_init(D, dtype)
    else:
        norm1 = {"scale": jnp.ones((L, D), dtype)}
        norm2 = {"scale": jnp.ones((L, D), dtype)}
        mlp = {
            "gate_proj": stack_init(dense_init, keys[3], D, I, True, dtype),
            "up_proj": stack_init(dense_init, keys[4], D, I, True, dtype),
            "down_proj": stack_init(dense_init, keys[5], I, D, True, dtype),
        }
        ln_q = rms_norm_init(D, dtype)

    return {
        "patch_embed": {"proj": dense_init(keys[0], cfg.patch_dim, D, False, dtype)},
        "blocks": {
            "norm1": norm1,
            "norm2": norm2,
            "attn": {
                "qkv": stack_init(dense_init, keys[1], D, 3 * D, True, dtype),
                "proj": stack_init(dense_init, keys[2], D, D, True, dtype),
            },
            "mlp": mlp,
        },
        "merger": {
            "ln_q": ln_q,
            "mlp_0": dense_init(keys[6], merged, merged, True, dtype),
            "mlp_2": dense_init(keys[7], merged, cfg.out_hidden_size, True, dtype),
        },
    }


def _vit_norm(cfg: VisionConfig, params, x):
    if cfg.arch == "qwen2":
        return layer_norm(params, x, 1e-6)
    return rms_norm(params, x, 1e-6)


def _vit_mlp(cfg: VisionConfig, mlp, x):
    if cfg.arch == "qwen2":
        return dense(mlp["fc2"], quick_gelu(dense(mlp["fc1"], x)))
    return dense(
        mlp["down_proj"],
        jax.nn.silu(dense(mlp["gate_proj"], x)) * dense(mlp["up_proj"], x),
    )


def _vit_block(h, block_params, *, cfg: VisionConfig, cos, sin, attn_apply):
    """h: (S, D). attn_apply(q, k, v) -> (S, H, Dh)."""
    S, D = h.shape
    H, Dh = cfg.num_heads, cfg.head_dim
    x = _vit_norm(cfg, block_params["norm1"], h)
    qkv = dense(block_params["attn"]["qkv"], x).reshape(S, 3, H, Dh)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    q, k = apply_vision_rope(q, k, cos, sin)
    attn = attn_apply(q, k, v)
    h = h + dense(block_params["attn"]["proj"], attn.reshape(S, H * Dh))

    x = _vit_norm(cfg, block_params["norm2"], h)
    return h + _vit_mlp(cfg, block_params["mlp"], x)


def vit_forward(
    params: Params,
    cfg: VisionConfig,
    pixel_values,          # (S, patch_dim)
    layout: VisionLayout,
    remat: bool = False,
    attn_impl=None,
):
    """Returns merged vision embeddings (S / spatial_merge_unit, out_hidden).

    Output order matches the original (pre-window-permutation) token order,
    i.e. directly scatterable into the LM sequence.
    """
    mu = cfg.spatial_merge_unit
    h = dense(params["patch_embed"]["proj"], pixel_values)  # (S, D)
    S = h.shape[0]
    H, Dh = cfg.num_heads, cfg.head_dim

    full_set = set(cfg.fullatt_block_indexes)
    all_full = len(full_set) == cfg.depth

    if all_full:
        # Qwen2-VL-style ViT: every layer attends over full frame chunks —
        # stay in the native token order, no window conversion at all.
        cos, sin = vision_rope_cos_sin(
            jnp.asarray(layout.pos_hw_native), cfg.head_dim, cfg.rope_theta,
        )
        full_chunk = layout.full_chunk
        # frame-chunk ids occupy identical index ranges in native and window
        # order (the window permutation never crosses a temporal chunk)
        full_segs_native = jnp.asarray(layout.full_segments)

        def full_attn_native(q, k, v):
            if full_chunk > 0:
                nc = S // full_chunk
                return dot_product_attention(
                    q.reshape(nc, full_chunk, H, Dh),
                    k.reshape(nc, full_chunk, H, Dh),
                    v.reshape(nc, full_chunk, H, Dh),
                    causal=False, impl=attn_impl or "xla",
                ).reshape(S, H, Dh)
            return dot_product_attention(
                q[None], k[None], v[None], causal=False,
                q_segment_ids=full_segs_native[None],
                kv_segment_ids=full_segs_native[None],
                impl=attn_impl or "xla",
            )[0]

        block = lambda hh, bp: _vit_block(
            hh, bp, cfg=cfg, cos=cos, sin=sin,
            attn_apply=full_attn_native,
        )
        if remat:
            block = jax.checkpoint(block)
        h, _ = jax.lax.scan(
            lambda hh, bp: (block(hh, bp), None), h, params["blocks"]
        )
        m = params["merger"]
        x = _vit_norm(cfg, m["ln_q"], h).reshape(S // mu, mu * cfg.hidden_size)
        x = dense(m["mlp_0"], x)
        x = jax.nn.gelu(x, approximate=False)
        return dense(m["mlp_2"], x)

    window_index = jnp.asarray(layout.window_index)
    h = h.reshape(S // mu, mu, -1)[window_index].reshape(S, -1)

    # --- padded-window layout: convert ONCE, run every layer at S_pad ------
    # Each token sits in exactly one window; padding windows to a uniform
    # `wt` tokens makes windowed attention a free reshape (28 of 32 layers)
    # at the cost of (S_pad - S)/S extra matmul work (typically <10%).
    win_valid = jnp.asarray(layout.win_valid)        # (n_win, wt)
    n_win, wt = layout.win_gather.shape
    pad_gather = jnp.asarray(layout.win_gather.reshape(-1))  # (S_pad,)
    to_compact = jnp.asarray(layout.win_scatter)     # (S,) -> padded idx
    S_pad = n_win * wt
    full_chunk = layout.full_chunk
    full_segs = jnp.asarray(layout.full_segments)

    h = h[pad_gather]  # (S_pad, D); pad slots replicate a window token
    cos, sin = vision_rope_cos_sin(
        jnp.asarray(layout.pos_hw[layout.win_gather.reshape(-1)]),
        cfg.head_dim, cfg.rope_theta,
    )

    # Pallas fused windowed-attention path (the TPU default): qkv/proj
    # weights are reshaped+zero-padded so the projections EMIT/CONSUME the
    # kernel's (H, S_pad, 128) layout directly — no transposes or pad copies
    # on the hot path, and rope runs lane-aligned via rotate_half_matrix.
    # The kernel path is only taken when a Mosaic-legal block plan exists
    # for this layout (small videos can produce window/chunk sizes that
    # violate the 8x128 tiling — enforced on real TPU only, so the guard
    # must NOT rely on the CPU interpret mode passing).
    from spacer_tpu.ops.vit_window_attention import window_kernel_plan

    use_window_kernel = (
        attn_impl == "pallas"
        or (attn_impl is None and jax.devices()[0].platform == "tpu")
    ) and window_kernel_plan(n_win, wt) is not None

    def windowed_attn(qkv):
        """Reshape into (n_win, wt) windows — zero gathers."""
        q, k, v = qkv
        out = dot_product_attention(
            q.reshape(n_win, wt, H, Dh),
            k.reshape(n_win, wt, H, Dh),
            v.reshape(n_win, wt, H, Dh),
            causal=False, kv_mask=win_valid, impl="xla",
        )
        return out.reshape(S_pad, H, Dh)

    def full_attn(qkv):
        """Gather to the compact order (frame chunks contiguous), attend,
        scatter back.  Chunks are small and head_dim is 80, so XLA beats
        the flash kernel here."""
        q, k, v = (x[to_compact] for x in qkv)
        if full_chunk > 0:
            nc = S // full_chunk
            out = dot_product_attention(
                q.reshape(nc, full_chunk, H, Dh),
                k.reshape(nc, full_chunk, H, Dh),
                v.reshape(nc, full_chunk, H, Dh),
                causal=False, impl=attn_impl or "xla",
            ).reshape(S, H, Dh)
        else:
            out = dot_product_attention(
                q[None], k[None], v[None], causal=False,
                q_segment_ids=full_segs[None], kv_segment_ids=full_segs[None],
                impl=attn_impl or "xla",
            )[0]
        return out[pad_gather]

    # fullatt_block_indexes is static: split the depth into contiguous runs
    # of windowed layers (scanned) with full-attention layers unrolled in
    # between — no runtime branching inside the scan body.
    if use_window_kernel:
        from spacer_tpu.nn.rope import rotate_half_matrix
        from spacer_tpu.ops.vit_window_attention import (
            validity_bias,
            window_attention_hsd,
        )

        interp = jax.devices()[0].platform != "tpu"
        L, Dm = cfg.depth, cfg.hidden_size
        DP = -(-Dh // 128) * 128
        A = params["blocks"]["attn"]
        qkvw_t = jnp.pad(
            A["qkv"]["kernel"].reshape(L, Dm, 3, H, Dh),
            ((0, 0), (0, 0), (0, 0), (0, 0), (0, DP - Dh)),
        )
        qkvb_t = jnp.pad(
            A["qkv"]["bias"].reshape(L, 3, H, 1, Dh),
            ((0, 0), (0, 0), (0, 0), (0, 0), (0, DP - Dh)),
        )
        projw_t = jnp.pad(
            A["proj"]["kernel"].reshape(L, H, Dh, Dm),
            ((0, 0), (0, 0), (0, DP - Dh), (0, 0)),
        )
        # pad lanes: cos=1, sin=0 and a zero row/col in R -> identity on pads
        cos_p = jnp.pad(cos.astype(jnp.float32), ((0, 0), (0, DP - Dh)),
                        constant_values=1.0)
        sin_p = jnp.pad(sin.astype(jnp.float32), ((0, 0), (0, DP - Dh)))
        Rm = jnp.asarray(rotate_half_matrix(Dh, DP))
        bias_arr = jnp.asarray(
            validity_bias(layout.win_valid.sum(axis=1), wt)
        )
        scale = Dh ** -0.5

        def rope_hsd(x):  # x: (H, S_pad, DP)
            # activation-dtype rope (the reference's flash-attn-2 path also
            # rotates in bf16); the Rm rotation itself is exact in any dtype
            c = cos_p.astype(x.dtype)
            s = sin_p.astype(x.dtype)
            return x * c[None] + (x @ Rm.astype(x.dtype)) * s[None]

        def win_kernel_block(hh, xs):
            bp, qkvw, qkvb, projw = xs
            x = _vit_norm(cfg, bp["norm1"], hh)
            qkv = jnp.einsum("sd,dthe->thse", x, qkvw) + qkvb
            q, k = rope_hsd(qkv[0]), rope_hsd(qkv[1])
            attn = window_attention_hsd(
                q, k, qkv[2], bias_arr, wt, scale, interp
            )
            hh = hh + (jnp.einsum("hse,hed->sd", attn, projw)
                       + bp["attn"]["proj"]["bias"])
            x = _vit_norm(cfg, bp["norm2"], hh)
            return hh + _vit_mlp(cfg, bp["mlp"], x)

        # full-attention layers reuse the SAME kernel with one frame chunk
        # as the "window" (uniform Mosaic-legal chunks only; ragged or
        # tile-unfriendly grids fall back to the XLA path)
        from spacer_tpu.ops.vit_window_attention import (
            chunk_kernel_supported,
        )

        use_full_kernel = full_chunk > 0 and chunk_kernel_supported(
            S, full_chunk)
        if use_full_kernel:
            from spacer_tpu.ops.vit_window_attention import (
                chunk_attention_hsd,
            )

            to_compact_j = jnp.asarray(layout.win_scatter)

            def full_kernel_block(hh, xs):
                bp, qkvw, qkvb, projw = xs
                x = _vit_norm(cfg, bp["norm1"], hh)
                qkv = jnp.einsum("sd,dthe->thse", x, qkvw) + qkvb
                q, k = rope_hsd(qkv[0]), rope_hsd(qkv[1])
                q, k, v = (t[:, to_compact_j] for t in (q, k, qkv[2]))
                attn = chunk_attention_hsd(
                    q, k, v, full_chunk, scale, interp
                )
                attn = attn[:, pad_gather]
                hh = hh + (jnp.einsum("hse,hed->sd", attn, projw)
                           + bp["attn"]["proj"]["bias"])
                x = _vit_norm(cfg, bp["norm2"], hh)
                return hh + _vit_mlp(cfg, bp["mlp"], x)

    def win_block(hh, bp):
        return _vit_block(hh, bp, cfg=cfg, cos=cos, sin=sin,
                          attn_apply=lambda q, k, v: windowed_attn((q, k, v)))

    def full_block(hh, bp):
        return _vit_block(hh, bp, cfg=cfg, cos=cos, sin=sin,
                          attn_apply=lambda q, k, v: full_attn((q, k, v)))

    if remat:
        win_block = jax.checkpoint(win_block)
        full_block = jax.checkpoint(full_block)
        if use_window_kernel:
            win_kernel_block = jax.checkpoint(win_kernel_block)
            if use_full_kernel:
                full_kernel_block = jax.checkpoint(full_kernel_block)

    full_set = set(cfg.fullatt_block_indexes)
    runs: list[tuple[bool, int, int]] = []  # (is_full, start, stop)
    i = 0
    while i < cfg.depth:
        j = i
        is_full_i = i in full_set
        while j < cfg.depth and (j in full_set) == is_full_i:
            j += 1
        runs.append((is_full_i, i, j))
        i = j

    def slice_params(a, b):
        return jax.tree.map(lambda x: x[a:b], params["blocks"])

    for is_full_run, a, b in runs:
        if is_full_run:
            for li in range(a, b):
                bp = jax.tree.map(lambda x: x[li], params["blocks"])
                if use_window_kernel and use_full_kernel:
                    h = full_kernel_block(
                        h, (bp, qkvw_t[li], qkvb_t[li], projw_t[li])
                    )
                else:
                    h = full_block(h, bp)
        elif use_window_kernel:
            h, _ = jax.lax.scan(
                lambda hh, xs: (win_kernel_block(hh, xs), None), h,
                (slice_params(a, b), qkvw_t[a:b], qkvb_t[a:b], projw_t[a:b]),
            )
        else:
            h, _ = jax.lax.scan(
                lambda hh, bp: (win_block(hh, bp), None), h, slice_params(a, b)
            )
    h = h[to_compact]  # back to the compact window-order layout

    # merger: norm -> group 4 -> linear/gelu/linear
    m = params["merger"]
    x = _vit_norm(cfg, m["ln_q"], h).reshape(S // mu, mu * cfg.hidden_size)
    x = dense(m["mlp_0"], x)
    x = jax.nn.gelu(x, approximate=False)
    x = dense(m["mlp_2"], x)

    reverse_index = jnp.asarray(layout.reverse_index)
    return x[reverse_index]
