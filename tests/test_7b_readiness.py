"""7B-scale readiness (VERDICT r1 item 7): does the REAL Qwen2.5-VL-7B
geometry fit and load?

- memory fit: per-chip bytes of policy + frozen ref + Adam moments under the
  fsdp-8 partition rules must leave headroom on a 16G v5e chip.
- streaming load: load_params_from_hf against a SYNTHETIC sharded
  safetensors checkpoint at the true 7B hidden geometry — fails if any
  parameter name, shape or transpose drifts from the HF layout. The default
  run uses 2 layers (full hidden/vocab/head dims, every name pattern);
  SPACER_FULL_7B=1 runs all 28 layers.
"""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl import QWEN25_VL_7B, init_params
from spacer_tpu.parallel import create_mesh, partition_spec_tree
from spacer_tpu.parallel.partition import _shrink_spec_to_shape

V5E_HBM_BYTES = 15.75 * 1024**3


def _per_chip_bytes(shapes, specs, mesh) -> int:
    total = 0
    for leaf, spec in zip(jax.tree.leaves(shapes), jax.tree.leaves(specs)):
        spec = _shrink_spec_to_shape(spec, leaf.shape, mesh)
        shards = 1
        for axis in tuple(spec):
            if axis is None:
                continue
            names = (axis,) if isinstance(axis, str) else tuple(axis)
            for n in names:
                shards *= mesh.shape[n]
        total += int(np.prod(leaf.shape)) * leaf.dtype.itemsize // shards
    return total


def test_7b_train_state_fits_v5e_fsdp8():
    cfg = QWEN25_VL_7B
    mesh = create_mesh({"fsdp": 8})
    shapes = jax.eval_shape(
        lambda k: init_params(k, cfg, jnp.bfloat16), jax.random.key(0)
    )
    specs = partition_spec_tree(shapes)
    params_b = _per_chip_bytes(shapes, specs, mesh)

    from spacer_tpu.train.optimizer import make_optimizer

    def opt_bytes(moment_dtype):
        tx = make_optimizer(learning_rate=1e-6, total_steps=100,
                            moment_dtype=moment_dtype)
        opt_shapes = jax.eval_shape(tx.init, shapes)
        opt_specs = partition_spec_tree(opt_shapes)
        return _per_chip_bytes(opt_shapes, opt_specs, mesh)

    # policy + frozen ref + transient grads + optimizer state.
    # f32 moments (the torch-parity default) are 8 bytes/param — on
    # fsdp-8 v5e that leaves <4 GiB of activation headroom, which is WHY
    # the 7B-on-v5e-8 recipe is moment_dtype="int8" (configs/sg_rlvr_7b:
    # blockwise moments, ~2.6 bytes/param) or offload_opt_state.
    headroom_f32 = V5E_HBM_BYTES - (3 * params_b + opt_bytes("float32"))
    assert headroom_f32 < 4 * 1024**3  # documents the capacity fact

    headroom = V5E_HBM_BYTES - (3 * params_b + opt_bytes("int8"))
    assert headroom > 4 * 1024**3, (
        f"7B train state leaves only {headroom/2**30:.2f} GiB for "
        f"activations on fsdp-8 with int8 moments "
        f"(params/chip {params_b/2**30:.2f} GiB)"
    )


def _hf_name_shapes(tcfg, vcfg, n_layers, n_vlayers):
    """The HF Qwen2.5-VL state-dict contract: name -> shape."""
    D, I = tcfg.hidden_size, tcfg.intermediate_size
    H, Hkv, Dh = tcfg.num_heads, tcfg.num_kv_heads, tcfg.head_dim
    names = {
        "model.embed_tokens.weight": (tcfg.vocab_size, D),
        "model.norm.weight": (D,),
        "lm_head.weight": (tcfg.vocab_size, D),
    }
    for i in range(n_layers):
        p = f"model.layers.{i}."
        names.update({
            p + "input_layernorm.weight": (D,),
            p + "post_attention_layernorm.weight": (D,),
            p + "self_attn.q_proj.weight": (H * Dh, D),
            p + "self_attn.q_proj.bias": (H * Dh,),
            p + "self_attn.k_proj.weight": (Hkv * Dh, D),
            p + "self_attn.k_proj.bias": (Hkv * Dh,),
            p + "self_attn.v_proj.weight": (Hkv * Dh, D),
            p + "self_attn.v_proj.bias": (Hkv * Dh,),
            p + "self_attn.o_proj.weight": (D, H * Dh),
            p + "mlp.gate_proj.weight": (I, D),
            p + "mlp.up_proj.weight": (I, D),
            p + "mlp.down_proj.weight": (D, I),
        })
    VD, VI = vcfg.hidden_size, vcfg.intermediate_size
    merged = VD * vcfg.spatial_merge_unit
    names.update({
        "visual.patch_embed.proj.weight": (
            VD, 3, vcfg.temporal_patch_size, vcfg.patch_size, vcfg.patch_size
        ),
        "visual.merger.ln_q.weight": (VD,),
        "visual.merger.mlp.0.weight": (merged, merged),
        "visual.merger.mlp.0.bias": (merged,),
        "visual.merger.mlp.2.weight": (vcfg.out_hidden_size, merged),
        "visual.merger.mlp.2.bias": (vcfg.out_hidden_size,),
    })
    for i in range(n_vlayers):
        p = f"visual.blocks.{i}."
        names.update({
            p + "norm1.weight": (VD,),
            p + "norm2.weight": (VD,),
            p + "attn.qkv.weight": (3 * VD, VD),
            p + "attn.qkv.bias": (3 * VD,),
            p + "attn.proj.weight": (VD, VD),
            p + "attn.proj.bias": (VD,),
            p + "mlp.gate_proj.weight": (VI, VD),
            p + "mlp.gate_proj.bias": (VI,),
            p + "mlp.up_proj.weight": (VI, VD),
            p + "mlp.up_proj.bias": (VI,),
            p + "mlp.down_proj.weight": (VD, VI),
            p + "mlp.down_proj.bias": (VD,),
        })
    return names


def _synth_checkpoint(tmp_path, n_layers, n_vlayers, n_shards=3,
                      vocab_size=None):
    """Sharded safetensors dir at TRUE 7B hidden geometry."""
    import dataclasses

    from safetensors.numpy import save_file

    cfg7 = QWEN25_VL_7B
    tcfg = dataclasses.replace(
        cfg7.text, num_layers=n_layers,
        vocab_size=vocab_size or cfg7.text.vocab_size,
    )
    # keep the full/window schedule valid for the reduced depth
    fullatt = tuple(i for i in cfg7.vision.fullatt_block_indexes
                    if i < n_vlayers) or (n_vlayers - 1,)
    vcfg = dataclasses.replace(cfg7.vision, depth=n_vlayers,
                               fullatt_block_indexes=fullatt)
    cfg = dataclasses.replace(cfg7, text=tcfg, vision=vcfg)

    import ml_dtypes

    names = _hf_name_shapes(tcfg, vcfg, n_layers, n_vlayers)
    keys = sorted(names)
    shards = [dict() for _ in range(n_shards)]
    marker = {}
    for j, k in enumerate(keys):
        shape = names[k]
        # zeros (calloc-fast even for the 545M-element embeds) with one
        # bf16-exact marker at flat[0]; stored bf16 like real checkpoints
        val = np.zeros(shape, ml_dtypes.bfloat16)
        val.flat[0] = float(j % 250 + 1)
        marker[k] = float(j % 250 + 1)
        shards[j % n_shards][k] = val
    for i, shard in enumerate(shards):
        save_file(shard, str(tmp_path / f"model-{i:05d}.safetensors"))
    return cfg, names, marker


def test_streaming_load_7b_geometry():
    import shutil
    import tempfile

    full = os.environ.get("SPACER_FULL_7B") == "1"
    n_layers = 28 if full else 2
    n_vlayers = 32 if full else 2
    # the full-vocab embed/lm_head pair is ~2GB of synthetic IO and dominates
    # the default CI run; vocab-size drift is caught by the eval_shape fit
    # test above, so the default variant shrinks ONLY the vocab axis
    vocab = None if full else 8192
    # tmpfs: the multi-GB synthetic checkpoint must not hit the slow disk
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="ckpt7b_", dir=base)
    try:
        _run_streaming_load(tmp, n_layers, n_vlayers, vocab)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _run_streaming_load(tmp_dir, n_layers, n_vlayers, vocab_size):
    from pathlib import Path

    tmp_path = Path(tmp_dir)
    cfg, names, marker = _synth_checkpoint(tmp_path, n_layers, n_vlayers,
                                           vocab_size=vocab_size)

    from spacer_tpu.models.qwen25_vl.loading import load_params_from_hf

    params, _ = load_params_from_hf(str(tmp_path), cfg=cfg,
                                    dtype=jnp.bfloat16)

    # every HF tensor must land transposed/stacked in the right slot
    qk = np.asarray(params["model"]["layers"]["self_attn"]["q_proj"]["kernel"])
    assert qk.shape == (n_layers, cfg.text.hidden_size,
                        cfg.text.num_heads * cfg.text.head_dim)
    for i in range(n_layers):
        expect = marker[f"model.layers.{i}.self_attn.q_proj.weight"]
        assert float(qk[i, 0, 0]) == expect, (i, float(qk[i, 0, 0]), expect)
    lm = np.asarray(params["model"]["lm_head"]["kernel"])
    assert lm.shape == (cfg.text.hidden_size, cfg.text.vocab_size)
    assert float(lm[0, 0]) == marker["lm_head.weight"]
    vq = np.asarray(params["visual"]["blocks"]["attn"]["qkv"]["kernel"])
    assert vq.shape == (n_vlayers, cfg.vision.hidden_size,
                        3 * cfg.vision.hidden_size)
    pe = np.asarray(params["visual"]["patch_embed"]["proj"]["kernel"])
    assert pe.shape == (cfg.vision.patch_dim, cfg.vision.hidden_size)

    # the sharded load must cover EVERY checkpoint tensor (geometry drift in
    # either direction shows up here)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    n_ckpt = sum(int(np.prod(s)) for s in names.values())
    assert n_params == n_ckpt
