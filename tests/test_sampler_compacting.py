"""Compacting grouped decode (sampler/compacting.py): greedy parity with the
monolithic lockstep loop + the compaction schedule actually firing."""

import numpy as np
import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl import init_params, tiny_config
from spacer_tpu.sampler import Sampler


def _prompts(cfg, B, S, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(10, cfg.text.vocab_size, size=(B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    pos = np.broadcast_to(np.arange(S)[None, None], (3, B, S)).astype(
        np.int32)
    deltas = np.zeros((B, 1), np.int32)
    return ids, mask, pos, deltas


def _gen(sampler, params, ids, mask, pos, deltas, G, C, **kw):
    return sampler.generate(
        ids, mask, params, position_ids=pos, deltas=deltas,
        num_generations=G, max_new_tokens=C, temperature=0.0, top_p=None,
        **kw)


def test_compacting_greedy_matches_monolithic():
    """Greedy compacting decode must emit exactly the monolithic loop's
    tokens (masked region) for every row, with an eos that retires rows at
    different depths so compaction actually reshapes the batch."""
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    B, G, S, C = 2, 4, 16, 24
    ids, mask, pos, deltas = _prompts(cfg, B, S)

    probe_sampler = Sampler(cfg, eos_token_id=-1, length_bucket=16)
    probe = _gen(probe_sampler, params, ids, mask, pos, deltas, G, C)
    # eos = a token some rows emit early, others late (or never)
    vals, counts = np.unique(probe.sequences[:, 2:10], return_counts=True)
    eos = int(vals[np.argmax(counts)])

    ref_sampler = Sampler(cfg, eos_token_id=eos, length_bucket=16)
    ref = _gen(ref_sampler, params, ids, mask, pos, deltas, G, C)
    got = _gen(ref_sampler, params, ids, mask, pos, deltas, G, C,
               compaction=True, chunk_steps=4)

    assert got.stats is not None and got.stats["chunks"] >= 2
    np.testing.assert_array_equal(got.lengths, ref.lengths)
    np.testing.assert_array_equal(got.completion_mask, ref.completion_mask)
    np.testing.assert_array_equal(
        got.sequences * got.completion_mask,
        ref.sequences * ref.completion_mask)


def test_compacting_compacts_and_survives_bucket_growth():
    """Force width-shrink + group-drop + a tail-bucket growth in one run."""
    cfg = tiny_config()
    params = init_params(jax.random.key(1), cfg, jnp.float32)
    B, G, S, C = 2, 4, 16, 160  # crosses the 128 tail bucket
    ids, mask, pos, deltas = _prompts(cfg, B, S, seed=3)

    probe_sampler = Sampler(cfg, eos_token_id=-1, length_bucket=16)
    probe = _gen(probe_sampler, params, ids, mask, pos, deltas, G, C)
    eos = int(probe.sequences[0, 5])

    ref_sampler = Sampler(cfg, eos_token_id=eos, length_bucket=16)
    ref = _gen(ref_sampler, params, ids, mask, pos, deltas, G, C)
    got = _gen(ref_sampler, params, ids, mask, pos, deltas, G, C,
               compaction=True, chunk_steps=8)

    np.testing.assert_array_equal(got.lengths, ref.lengths)
    np.testing.assert_array_equal(
        got.sequences * got.completion_mask,
        ref.sequences * ref.completion_mask)
    if int(ref.lengths.max()) > 128:
        assert got.stats["chunks"] > 128 // 8
    # at least one compaction unless every row ran to the same depth
    if len(set(ref.lengths.tolist())) > 1:
        assert got.stats["compactions"] >= 1
        assert got.stats["final_rows"] < B * G


def test_compacting_non_pow2_group_width():
    """num_generations=6: candidate widths 6/3/1 are not powers of two, so
    the planner must keep row totals multiples of the width (a pow2 ROW
    rounding indexed past the plan arrays and crashed mid-rollout)."""
    cfg = tiny_config()
    params = init_params(jax.random.key(3), cfg, jnp.float32)
    B, G, S, C = 2, 6, 16, 48
    ids, mask, pos, deltas = _prompts(cfg, B, S, seed=7)

    probe_sampler = Sampler(cfg, eos_token_id=-1, length_bucket=16)
    probe = _gen(probe_sampler, params, ids, mask, pos, deltas, G, C)
    vals, counts = np.unique(probe.sequences[:, 2:12], return_counts=True)
    eos = int(vals[np.argmax(counts)])

    ref_sampler = Sampler(cfg, eos_token_id=eos, length_bucket=16)
    ref = _gen(ref_sampler, params, ids, mask, pos, deltas, G, C)
    got = _gen(ref_sampler, params, ids, mask, pos, deltas, G, C,
               compaction=True, chunk_steps=4)

    np.testing.assert_array_equal(got.lengths, ref.lengths)
    np.testing.assert_array_equal(
        got.sequences * got.completion_mask,
        ref.sequences * ref.completion_mask)
    if len(set(ref.lengths.tolist())) > 1:
        assert got.stats["compactions"] >= 1


def test_compacting_int8_kv_runs():
    """Quantized caches ride through compaction gathers (4-tuple entries)."""
    cfg = tiny_config()
    params = init_params(jax.random.key(2), cfg, jnp.float32)
    B, G, S, C = 2, 4, 16, 20
    ids, mask, pos, deltas = _prompts(cfg, B, S, seed=5)
    probe_sampler = Sampler(cfg, eos_token_id=-1, length_bucket=16,
                            decode_quant="int8_kv")
    probe = _gen(probe_sampler, params, ids, mask, pos, deltas, G, C)
    eos = int(probe.sequences[0, 4])
    s = Sampler(cfg, eos_token_id=eos, length_bucket=16,
                decode_quant="int8_kv")
    ref = _gen(s, params, ids, mask, pos, deltas, G, C)
    got = _gen(s, params, ids, mask, pos, deltas, G, C, compaction=True,
               chunk_steps=4)
    np.testing.assert_array_equal(got.lengths, ref.lengths)
    np.testing.assert_array_equal(
        got.sequences * got.completion_mask,
        ref.sequences * ref.completion_mask)
