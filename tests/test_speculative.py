"""Speculative decoding (serving/speculative.py): bit-identical greedy
parity with the clock-ring batcher, exact-in-distribution sampling,
acceptance telemetry, and scope validation.

Role parity: the reference's serving engine (vLLM 0.7.2,
vllm_grpo_trainer_modified.py:359-384) ships n-gram prompt-lookup
speculation as an experimental flag; here it is a first-class opt-in
(`speculate_k`) whose greedy outputs are verified-exact by construction.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl import init_params, tiny_config
from spacer_tpu.serving import ContinuousBatcher


def _req(cfg, S, seed):
    r = np.random.RandomState(seed)
    return {
        "input_ids": r.randint(
            10, cfg.text.vocab_size, size=(1, S)).astype(np.int32),
        "attention_mask": np.ones((1, S), np.int32),
        "position_ids": np.broadcast_to(
            np.arange(S)[None, None], (3, 1, S)).astype(np.int32),
        "deltas": np.zeros((1, 1), np.int32),
    }


def _mk(cfg, params, *, speculate_k=0, eos=11, Cmax=24, Pmax=16):
    return ContinuousBatcher(
        cfg, params, slots=2, prompt_len=Pmax, max_new_tokens=Cmax,
        eos_token_id=eos, temperature=0.0, chunk_steps=4,
        dtype=jnp.float32, speculate_k=speculate_k)


def _assert_same(outs_a, outs_b):
    for a, b in zip(outs_a, outs_b):
        assert a.length == b.length
        np.testing.assert_array_equal(
            a.sequences[: a.length], b.sequences[: b.length])


def test_speculative_greedy_parity_with_refill():
    """Spec outputs must be BIT-identical to ring greedy decoding across
    slot refills and mixed prompt lengths — acceptance only changes how
    many steps it takes, never what is emitted."""
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    reqs = [_req(cfg, S, i) for i, S in enumerate([12, 16, 7, 16, 10])]

    plain = _mk(cfg, params).run(reqs)
    spec_b = _mk(cfg, params, speculate_k=3)
    spec = spec_b.run(reqs)
    _assert_same(plain, spec)

    stats = spec_b.spec_stats
    assert stats["steps"] > 0
    # random tiny models loop, so lookup drafts land: real acceptance > 1
    assert stats["tokens"] > stats["steps"]


def test_speculative_full_budget_rows():
    """Rows that never emit EOS run to the full budget: exercises the
    block-write clamp at the tail boundary (slots >= Cmax are dropped;
    acceptance is budget-capped)."""
    cfg = tiny_config()
    params = init_params(jax.random.key(1), cfg, jnp.float32)
    reqs = [_req(cfg, 9, 100 + i) for i in range(3)]

    plain = _mk(cfg, params, eos=-1).run(reqs)
    spec = _mk(cfg, params, eos=-1, speculate_k=3).run(reqs)
    _assert_same(plain, spec)
    for o in plain:
        assert o.length == 24  # every row ran to budget


def test_speculative_scope_validation():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    with pytest.raises(ValueError, match=">= 0"):
        ContinuousBatcher(cfg, params, slots=1, prompt_len=8,
                          max_new_tokens=4, temperature=0.0,
                          dtype=jnp.float32, speculate_k=-1)
    with pytest.raises(ValueError, match="position-major"):
        ContinuousBatcher(cfg, params, slots=1, prompt_len=8,
                          max_new_tokens=4, temperature=0.0,
                          dtype=jnp.float32, speculate_k=2,
                          decode_impl="flash_ref")


@pytest.mark.parametrize("quant", ["int8", "int8_kv"])
def test_speculative_quantized(quant):
    """int8 weights and int8 KV caches compose with speculation (block
    writes carry the per-(position, head) scales through the same one-hot
    path); parity vs the equally-quantized ring path."""
    cfg = tiny_config()
    params = init_params(jax.random.key(2), cfg, jnp.float32)
    reqs = [_req(cfg, 10, 200 + i) for i in range(3)]
    plain = ContinuousBatcher(
        cfg, params, slots=2, prompt_len=16, max_new_tokens=16,
        eos_token_id=11, temperature=0.0, chunk_steps=4,
        dtype=jnp.float32, decode_quant=quant).run(reqs)
    spec = ContinuousBatcher(
        cfg, params, slots=2, prompt_len=16, max_new_tokens=16,
        eos_token_id=11, temperature=0.0, chunk_steps=4,
        dtype=jnp.float32, decode_quant=quant, speculate_k=2).run(reqs)
    _assert_same(plain, spec)


def test_speculative_with_mesh_sharded_params():
    """Speculation over mesh-sharded params (fsdp x tp, the multi-chip
    eval deployment): GSPMD partitions the block-verify program around
    the parameter shardings; outputs must match the unsharded spec run
    AND the unsharded ring run exactly (greedy, f32)."""
    from jax.sharding import Mesh

    from spacer_tpu.parallel.partition import shard_params

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    reqs = [_req(cfg, S, 300 + i) for i, S in enumerate([5, 9, 7, 6])]
    kw = dict(slots=2, prompt_len=16, max_new_tokens=7, eos_token_id=-1,
              temperature=0.0, chunk_steps=3, dtype=jnp.float32)

    ref = ContinuousBatcher(cfg, params, **kw).run(reqs)

    devices = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devices, ("data", "fsdp", "tp"))
    sharded, _ = shard_params(params, mesh)
    with mesh:
        got = ContinuousBatcher(cfg, sharded, **kw,
                                speculate_k=2).run(reqs)
    _assert_same(ref, got)


def test_speculative_serves_aria_family():
    """Family-generic: the MoE feed-forward (Aria) dispatches through the
    shared _mlp_block inside the speculative block layer, exactly like the
    ragged ring layer; greedy parity vs the ring batcher."""
    from spacer_tpu.models.aria.config import tiny_aria_config
    from spacer_tpu.models.aria.model import init_params as aria_init
    from spacer_tpu.models.registry import aria_positions

    cfg = tiny_aria_config()
    params = aria_init(jax.random.key(0), cfg, jnp.float32)
    rng = np.random.RandomState(5)
    reqs = []
    for S in [5, 9, 7]:
        ids = rng.randint(10, cfg.text.vocab_size, size=(1, S)).astype(
            np.int32)
        mask = np.ones((1, S), np.int32)
        pos3, deltas = aria_positions(cfg, ids, mask)
        reqs.append({"input_ids": ids, "attention_mask": mask,
                     "position_ids": pos3, "deltas": deltas})

    kw = dict(slots=2, prompt_len=16, max_new_tokens=6, eos_token_id=-1,
              temperature=0.0, chunk_steps=4, dtype=jnp.float32)
    plain = ContinuousBatcher(cfg, params, **kw).run(reqs)
    spec = ContinuousBatcher(cfg, params, **kw, speculate_k=2).run(reqs)
    _assert_same(plain, spec)


def test_speculative_sample_is_exact():
    """Rejection-sampling exactness with delta drafts: for any fixed
    target distribution p and any draft token, P(emit y) == p(y).  Monte
    Carlo over many independent rows with a fixed key (deterministic)."""
    from spacer_tpu.serving.speculative import _speculative_sample

    V, N = 8, 120_000
    rng = np.random.RandomState(0)
    base = rng.dirichlet(np.ones(V))           # one target distribution
    # two positions per block (k=1 drafts + bonus); same p at both
    p = jnp.asarray(np.broadcast_to(base, (N, 2, V)).copy(), jnp.float32)
    draft = int(np.argsort(base)[-2])          # a mid-probability draft
    drafts = jnp.full((N, 1), draft, jnp.int32)
    emit, a = _speculative_sample(p, drafts, jax.random.key(7))

    first = np.asarray(emit[:, 0])
    freq = np.bincount(first, minlength=V) / N
    # 5-sigma binomial tolerance per bin
    tol = 5 * np.sqrt(base * (1 - base) / N)
    np.testing.assert_array_less(np.abs(freq - base), tol + 1e-12)
    # acceptance rate of the delta draft == p(draft)
    acc = float((np.asarray(a) == 2).mean())
    assert abs(acc - base[draft]) < 5 * np.sqrt(
        base[draft] * (1 - base[draft]) / N)


def test_speculative_sample_multi_draft_chain():
    """k=2 with DISTINCT per-position distributions: position-0 marginal,
    the continuation chain P(a>=2)=p0(d1), P(a>=3 | a>=2)=p1(d2), and the
    position-1 marginal CONDITIONED on acceptance at position 0 must all
    match — pins the excl/m position indexing the k=1 test cannot see."""
    from spacer_tpu.serving.speculative import _speculative_sample

    V, N = 8, 150_000
    rng = np.random.RandomState(1)
    p0, p1, p2 = (rng.dirichlet(np.ones(V)) for _ in range(3))
    p = jnp.asarray(np.broadcast_to(
        np.stack([p0, p1, p2]), (N, 3, V)).copy(), jnp.float32)
    d1, d2 = int(np.argsort(p0)[-2]), int(np.argsort(p1)[-3])
    drafts = jnp.asarray(np.broadcast_to(
        np.array([d1, d2], np.int32), (N, 2)).copy())
    emit, a = _speculative_sample(p, drafts, jax.random.key(11))
    emit, a = np.asarray(emit), np.asarray(a)

    def close(x, q, n):
        assert abs(x - q) < 5 * np.sqrt(max(q * (1 - q), 1e-6) / n), (x, q)

    close(float((a >= 2).mean()), p0[d1], N)                 # accept d1
    acc0 = a >= 2
    close(float((a[acc0] >= 3).mean()), p1[d2], int(acc0.sum()))
    # position-0 marginal == p0 (bin-wise)
    freq0 = np.bincount(emit[:, 0], minlength=V) / N
    np.testing.assert_array_less(
        np.abs(freq0 - p0), 5 * np.sqrt(p0 * (1 - p0) / N) + 1e-12)
    # position-1 marginal GIVEN acceptance at 0 == p1
    n1 = int(acc0.sum())
    freq1 = np.bincount(emit[acc0, 1], minlength=V) / n1
    np.testing.assert_array_less(
        np.abs(freq1 - p1), 5 * np.sqrt(p1 * (1 - p1) / n1) + 1e-12)


def test_speculative_sampled_e2e():
    """temperature > 0 speculation runs end-to-end: in-vocab outputs,
    budget respected, telemetry sane; clones differ (independent rng)."""
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    reqs = [_req(cfg, 10, 400 + i) for i in range(4)]
    b = ContinuousBatcher(
        cfg, params, slots=2, prompt_len=16, max_new_tokens=20,
        eos_token_id=11, temperature=1.0, top_p=0.95, chunk_steps=4,
        dtype=jnp.float32, speculate_k=2)
    outs = b.run(reqs)
    for o in outs:
        assert 1 <= o.length <= 20
        toks = np.asarray(o.sequences[:o.length])
        assert toks.min() >= 0 and toks.max() < cfg.text.vocab_size
    stats = b.spec_stats
    assert stats["steps"] > 0 and stats["tokens"] >= stats["steps"]
    # clones of the SAME prompt sample independently (at temperature 1 on
    # a random model, 4 identical 20-token completions are ~impossible)
    clones = ContinuousBatcher(
        cfg, params, slots=2, prompt_len=16, max_new_tokens=20,
        eos_token_id=-1, temperature=1.0, top_p=0.95, chunk_steps=4,
        dtype=jnp.float32, speculate_k=2).run(
            [dict(reqs[0]) for _ in range(4)])
    seqs = {tuple(np.asarray(o.sequences[:o.length])) for o in clones}
    assert len(seqs) > 1


def test_engine_generate_many_speculative():
    """QwenEngine plumbs speculate_k through to the cached batchers and
    text outputs match the non-speculative engine at temperature 0."""
    from spacer_tpu.data import MockTokenizer, VLProcessor
    from spacer_tpu.evalharness import QwenEngine

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    tok = MockTokenizer(vocab_size=cfg.text.vocab_size)
    proc = VLProcessor(tok, cfg, min_pixels=3136, max_pixels=12544)
    messages = [
        [{"role": "user", "content": [{"type": "text",
                                       "text": f"question {i} about x"}]}]
        for i in range(4)
    ]
    base = QwenEngine(cfg, params, proc).generate_many(
        messages, max_new_tokens=12, temperature=0.0, slots=2,
        chunk_steps=4)
    spec = QwenEngine(cfg, params, proc, speculate_k=3).generate_many(
        messages, max_new_tokens=12, temperature=0.0, slots=2,
        chunk_steps=4)
    assert base == spec
