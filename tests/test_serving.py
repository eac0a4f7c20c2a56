"""Continuous batching: slot refill, ragged decode, engine integration.

The serving path must agree with the grouped Sampler token-for-token under
greedy decoding in f32: both run the same prefill (lm_forward) and
mathematically identical decode attention (merged masked softmax == the
sampler's prefix/tail concat), so any drift means a masking/index bug."""

import numpy as np
import jax
import jax.numpy as jnp

from spacer_tpu.models.qwen25_vl import init_params, tiny_config
from spacer_tpu.sampler import Sampler
from spacer_tpu.serving import ContinuousBatcher


def _prompts(cfg, lengths, seed=0):
    rng = np.random.RandomState(seed)
    reqs = []
    for S in lengths:
        ids = rng.randint(10, cfg.text.vocab_size, size=(1, S)).astype(
            np.int32)
        reqs.append({
            "input_ids": ids,
            "attention_mask": np.ones((1, S), np.int32),
            "position_ids": np.broadcast_to(
                np.arange(S)[None, None], (3, 1, S)).astype(np.int32),
            "deltas": np.zeros((1, 1), np.int32),
        })
    return reqs


def _sampler_reference(cfg, params, reqs, eos, max_new):
    """Per-prompt greedy generations via the grouped sampler."""
    s = Sampler(cfg, eos_token_id=eos, length_bucket=16)
    outs = []
    for r in reqs:
        o = s.generate(
            r["input_ids"], r["attention_mask"], params,
            position_ids=r["position_ids"], deltas=r["deltas"],
            num_generations=1, max_new_tokens=max_new, temperature=0.0,
        )
        outs.append((o.sequences[0], int(o.lengths[0])))
    return outs


def test_batcher_matches_sampler_with_refill():
    """More requests than slots, tiny chunks -> multiple refill cycles.
    eos is chosen from an actual generated token so some prompts stop early
    (exercising slot turnover) and others run to max_new."""
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    reqs = _prompts(cfg, [4, 7, 10, 5, 9, 6])
    max_new = 12

    probe = _sampler_reference(cfg, params, reqs, eos=-1, max_new=max_new)
    eos = int(probe[0][0][4])  # token prompt 0 emits at position 4

    expected = _sampler_reference(cfg, params, reqs, eos=eos,
                                  max_new=max_new)
    lengths = [n for _, n in expected]
    assert min(lengths) < max_new, "eos choice must stop something early"
    assert max(lengths) == max_new, "something must run to the cap"

    b = ContinuousBatcher(
        cfg, params, slots=2, prompt_len=16, max_new_tokens=max_new,
        eos_token_id=eos, temperature=0.0, chunk_steps=3,
        dtype=jnp.float32)
    got = b.run(reqs)
    for (eseq, elen), g in zip(expected, got):
        assert g.length == elen, (elen, g.length)
        np.testing.assert_array_equal(g.sequences[:elen], eseq[:elen])


def test_batcher_single_chunk_all_slots():
    """All requests fit the slot count; one big chunk, no refill."""
    cfg = tiny_config()
    params = init_params(jax.random.key(1), cfg, jnp.float32)
    reqs = _prompts(cfg, [6, 6, 8], seed=2)
    expected = _sampler_reference(cfg, params, reqs, eos=-1, max_new=6)

    b = ContinuousBatcher(
        cfg, params, slots=3, prompt_len=16, max_new_tokens=6,
        eos_token_id=-1, temperature=0.0, chunk_steps=64,
        dtype=jnp.float32)
    got = b.run(reqs)
    for (eseq, elen), g in zip(expected, got):
        assert g.length == elen == 6
        np.testing.assert_array_equal(g.sequences[:elen], eseq[:elen])


def test_batcher_int8_weights_run():
    """decode_quant='int8' serving path executes and terminates."""
    cfg = tiny_config()
    params = init_params(jax.random.key(2), cfg, jnp.float32)
    reqs = _prompts(cfg, [5, 8], seed=3)
    b = ContinuousBatcher(
        cfg, params, slots=2, prompt_len=16, max_new_tokens=5,
        eos_token_id=-1, temperature=0.0, chunk_steps=8,
        decode_quant="int8", dtype=jnp.float32)
    got = b.run(reqs)
    assert [g.length for g in got] == [5, 5]


def test_batcher_int8_kv_runs_with_refill():
    """int8_kv serving (quantized prefix + ring caches) across refill
    cycles: terminates, respects per-request budgets, and agrees with
    the bf16 serving path on most greedy tokens (int8 noise can flip
    near-tie argmaxes at tiny random scale, so exact match is not
    required — see test_quant.py for the step-level logit bound)."""
    cfg = tiny_config()
    params = init_params(jax.random.key(2), cfg, jnp.float32)
    reqs = _prompts(cfg, [5, 8, 11, 6], seed=4)
    for i, r in enumerate(reqs):
        r["max_new_tokens"] = [9, 4, 7, 9][i]
    kw = dict(slots=2, prompt_len=16, max_new_tokens=9, eos_token_id=-1,
              temperature=0.0, chunk_steps=3, dtype=jnp.float32)
    ref = ContinuousBatcher(cfg, params, **kw).run(reqs)
    got = ContinuousBatcher(cfg, params, decode_quant="int8_kv",
                            **kw).run(reqs)
    assert [g.length for g in got] == [r.length for r in ref] == [9, 4, 7, 9]
    agree = np.mean([
        (g.sequences[:g.length] == r.sequences[:r.length]).mean()
        for g, r in zip(got, ref)])
    assert agree >= 0.5, agree


def test_batcher_int4_kv_runs():
    """int4_kv serving (packed-int4 weights + int8 caches): terminates
    with correct budgets.  int4's ~13% weight RMS error scrambles greedy
    argmaxes at tiny random scale, so only structural properties are
    asserted here; ops-level parity lives in test_int4_matmul.py."""
    cfg = tiny_config()
    params = init_params(jax.random.key(2), cfg, jnp.float32)
    reqs = _prompts(cfg, [5, 8], seed=4)
    for i, r in enumerate(reqs):
        r["max_new_tokens"] = [6, 4][i]
    got = ContinuousBatcher(
        cfg, params, decode_quant="int4_kv", slots=2, prompt_len=16,
        max_new_tokens=6, eos_token_id=-1, temperature=0.0, chunk_steps=3,
        dtype=jnp.float32).run(reqs)
    assert [g.length for g in got] == [6, 4]
    for g in got:
        assert (g.sequences[:g.length] >= 0).all()
        assert (g.sequences[:g.length] < cfg.text.vocab_size).all()


def test_engine_generate_many_matches_generate():
    """QwenEngine.generate_many (continuous batching) returns the same
    greedy strings as the static-batched generate() for video prompts."""
    from PIL import Image

    from spacer_tpu.data import MockTokenizer, VLProcessor
    from spacer_tpu.evalharness import QwenEngine

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    tok = MockTokenizer(vocab_size=cfg.text.vocab_size)
    proc = VLProcessor(tok, cfg)
    engine = QwenEngine(cfg, params, proc, attn_impl="xla", length_bucket=64)

    rng = np.random.default_rng(0)

    def frames(n, size):
        return [
            Image.fromarray(rng.integers(0, 256, (size, size, 3), np.uint8))
            for _ in range(n)
        ]

    messages_list = [
        [{"role": "user", "content": [
            {"type": "video", "video": frames(2, 56)},
            {"type": "text", "text": "what is this"},
        ]}],
        [{"role": "user", "content": [
            {"type": "video", "video": frames(4, 112)},
            {"type": "text", "text": "and this other longer question"},
        ]}],
        [{"role": "user", "content": [
            {"type": "text", "text": "plain text prompt"},
        ]}],
    ]
    ref = engine.generate(messages_list, max_new_tokens=5, temperature=0.0)
    got = engine.generate_many(messages_list, max_new_tokens=5,
                               temperature=0.0, slots=2, chunk_steps=2)
    assert got == ref


def test_batcher_serves_aria_family():
    """The serving engine is family-generic: the MoE feed-forward (Aria)
    dispatches through the shared _mlp_block inside the ragged layer, and
    greedy outputs match the grouped Sampler per prompt."""
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

    s = Sampler(cfg, eos_token_id=-1, length_bucket=16)
    expected = []
    for r in reqs:
        o = s.generate(r["input_ids"], r["attention_mask"], params,
                       position_ids=r["position_ids"], deltas=r["deltas"],
                       num_generations=1, max_new_tokens=6, temperature=0.0)
        expected.append(o.sequences[0])

    b = ContinuousBatcher(
        cfg, params, slots=2, prompt_len=16, max_new_tokens=6,
        eos_token_id=-1, temperature=0.0, chunk_steps=4, dtype=jnp.float32)
    got = b.run(reqs)
    for e, g in zip(expected, got):
        assert g.length == 6
        np.testing.assert_array_equal(g.sequences[:6], e[:6])


def test_batcher_with_mesh_sharded_params():
    """Serving over mesh-sharded params (fsdp x tp, the multi-chip eval
    deployment): jit partitions the decode/admit programs around the
    parameter shardings; outputs must match the single-device run exactly
    (greedy, f32)."""
    from jax.sharding import Mesh

    from spacer_tpu.parallel.partition import shard_params

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    reqs = _prompts(cfg, [5, 9, 7, 6], seed=6)
    kw = dict(slots=2, prompt_len=16, max_new_tokens=7, eos_token_id=-1,
              temperature=0.0, chunk_steps=3, dtype=jnp.float32)

    ref = ContinuousBatcher(cfg, params, **kw).run(reqs)

    devices = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devices, ("data", "fsdp", "tp"))
    sharded, _ = shard_params(params, mesh)
    with mesh:
        got = ContinuousBatcher(cfg, sharded, **kw).run(reqs)
    for r, g in zip(ref, got):
        assert g.length == r.length == 7
        np.testing.assert_array_equal(g.sequences[:7], r.sequences[:7])


def test_generate_many_buckets_prompt_lengths():
    """Mixed short/long prompts run in SEPARATE batcher geometries: the
    short wave's Pmax stays at its own bucket (a long outlier must not tax
    every request with its prefill/prefix-attention size), batchers are
    cached across calls, and results keep caller order (VERDICT r2 #7)."""
    from spacer_tpu.data import MockTokenizer, VLProcessor
    from spacer_tpu.evalharness import QwenEngine

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    tok = MockTokenizer(vocab_size=cfg.text.vocab_size)
    proc = VLProcessor(tok, cfg)
    engine = QwenEngine(cfg, params, proc, attn_impl="xla", length_bucket=32)

    def text_msgs(words):
        return [{"role": "user", "content": [
            {"type": "text", "text": " ".join(["tok"] * words)}]}]

    messages_list = [text_msgs(3), text_msgs(90), text_msgs(4), text_msgs(85)]
    ref = engine.generate(messages_list[:1], max_new_tokens=4,
                          temperature=0.0)
    got = engine.generate_many(messages_list, max_new_tokens=4,
                               temperature=0.0, slots=2, chunk_steps=2)
    assert got[0] == ref[0]
    pmaxes = sorted(k[0] for k in engine._batchers)
    assert len(pmaxes) == 2 and pmaxes[0] == 32 and pmaxes[1] > 32
    # second call with the same geometry reuses the cached batchers
    n_batchers = len(engine._batchers)
    again = engine.generate_many(messages_list, max_new_tokens=4,
                                 temperature=0.0, slots=2, chunk_steps=2)
    assert again == got
    assert len(engine._batchers) == n_batchers


def test_admission_dedupes_identical_prompts(monkeypatch):
    """An n-sampling wave (same prompt cloned into several slots — the
    reference vLLM engine's enable_prefix_caching role) prefills ONCE:
    the admission program receives Bu unique rows < Bq admissions, and
    greedy clones emit exactly the single-request answer."""
    import spacer_tpu.serving.batcher as B

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    base = _prompts(cfg, [9], seed=11)[0]

    seen = []
    real = B._admit_jit

    def spy(state, params_, input_ids, *args, **kw):
        seen.append((input_ids.shape[0], args[5].shape[0]))  # (Bu, Bq)
        return real(state, params_, input_ids, *args, **kw)

    monkeypatch.setattr(B, "_admit_jit", spy)
    kw = dict(slots=4, prompt_len=16, max_new_tokens=8, eos_token_id=-1,
              temperature=0.0, chunk_steps=4, dtype=jnp.float32)
    # four clones of one request object (the server's n-path shape)
    outs = ContinuousBatcher(cfg, params, **kw).run([dict(base)
                                                     for _ in range(4)])
    assert seen and seen[0] == (1, 4)  # one unique prefill, four slots
    ref = ContinuousBatcher(cfg, params, **kw).run([base])
    for o in outs:
        assert o.length == ref[0].length
        np.testing.assert_array_equal(o.sequences[:o.length],
                                      ref[0].sequences[:ref[0].length])
