"""CPU smoke tests for the driver bench entry (bench.py).

The driver runs `python bench.py` on the real chip at the END of the round
to record the headline metric — a code break in bench.py (an import, a
renamed sampler kwarg, a shape contract) would silently cost the round its
measured number.  These tests run the same bench functions at tiny-config
scale on the CPU mesh so any such break fails the suite first.

The timings these produce are meaningless; only execution + JSON shape are
asserted.  The measured configurations are the functions' DEFAULT calls.
"""

import json

import pytest

import bench
from spacer_tpu.models.qwen25_vl import tiny_config

pytestmark = pytest.mark.slow


def _check(result):
    # every bench result must be one JSON-serializable dict with the
    # driver's contract fields
    s = json.dumps(result)
    back = json.loads(s)
    assert back["metric"]
    assert back["unit"]
    assert float(back["value"]) > 0
    assert "vs_baseline" in back


def test_bench_iteration_smoke(monkeypatch):
    monkeypatch.setenv("SPACER_BENCH_UPDATE_GROUPS", "1")
    result = bench.bench_iteration(
        B=2, G=2, P_len=64, C=16, iters=1,
        cfg=tiny_config(), vid=(4, 112, 140),
    )
    _check(result)
    assert result["rollout_quant"] == "int8_kv"
    assert result["update_programs_per_step"] == 1


def test_bench_iteration_phased_smoke(monkeypatch):
    # the pinned-host phased update (ref + moments offloaded, stored ref
    # logps, f32 one-apply accumulator) must stay runnable
    monkeypatch.setenv("SPACER_BENCH_UPDATE_GROUPS", "2")
    monkeypatch.setenv("SPACER_BENCH_PHASED", "1")
    result = bench.bench_iteration(
        B=2, G=2, P_len=64, C=16, iters=1,
        cfg=tiny_config(), vid=(4, 112, 140),
    )
    _check(result)
    assert result["update_programs_per_step"] == 1


def test_bench_iteration_scan_accum_smoke(monkeypatch):
    # the one-program scan accumulation leg (step.step_accum wired through
    # the bench) must stay runnable
    monkeypatch.setenv("SPACER_BENCH_UPDATE_GROUPS", "2")
    monkeypatch.setenv("SPACER_BENCH_SCAN_ACCUM", "1")
    result = bench.bench_iteration(
        B=2, G=2, P_len=64, C=16, iters=1,
        cfg=tiny_config(), vid=(4, 112, 140),
    )
    _check(result)
    assert result["update_programs_per_step"] == 1


def test_bench_encode_smoke():
    result = bench.bench_encode(
        cfg=tiny_config().vision, T=2, iters=2, host_frames=12,
    )
    _check(result)
    # the measured host stages must be real numbers, not zeros
    assert result["host_decode_only_fps_per_core_measured"] > 0
    assert result["host_ref_pipeline_fps_per_core_measured"] > 0


def test_bench_serving_smoke():
    result = bench.bench_serving(
        slots=2, n_requests=4, P_len=32, Cmax=32, cfg=tiny_config(),
    )
    _check(result)
    assert result["requests"] == 4


def test_bench_speculative_smoke():
    result = bench.bench_speculative(
        slots=2, n_requests=4, P_len=32, Cmax=16, k=2, cfg=tiny_config(),
    )
    _check(result)
    assert result["acceptance_tokens_per_step"] >= 1.0


def test_bench_7b_rollout_smoke():
    # tiny geometry through the SAME code path (synthetic quantized param
    # build, int8_kv grouped rollout) — bench_7b_rollout was the one bench
    # mode with no smoke coverage (VERDICT r4 weak #8)
    result = bench.bench_7b_rollout(
        G=2, P_len=64, C=16, cfg=tiny_config(), vid=(4, 112, 140),
    )
    _check(result)
    assert result["rollout_quant"] == "int8_kv"
    # tiny model rounds to 0.00 GiB; the field just has to exist + be finite
    assert result["params_resident_gib"] >= 0


def test_bench_rollout_spec_smoke():
    result = bench.bench_rollout_spec(
        B=2, G=2, P_len=32, C=16, k=2, cfg=tiny_config(),
    )
    _check(result)
    assert result["greedy_acceptance"] >= 1.0
    assert result["sampled_acceptance"] >= 1.0


def test_device_wait_disabled(monkeypatch):
    # SPACER_BENCH_DEVICE_WAIT_S=0 must short-circuit without spawning any
    # probe subprocess (the CPU test env's subprocesses would hang on the
    # axon plugin)
    import subprocess

    monkeypatch.setenv("SPACER_BENCH_DEVICE_WAIT_S", "0")

    def boom(*a, **k):  # pragma: no cover - must never run
        raise AssertionError("probe subprocess spawned despite WAIT_S=0")

    monkeypatch.setattr(subprocess, "run", boom)
    bench._wait_for_devices()


def test_device_wait_success(monkeypatch):
    import subprocess
    import types

    monkeypatch.setenv("SPACER_BENCH_DEVICE_WAIT_S", "60")
    calls = []

    def fake_run(*a, **k):
        calls.append(a)
        return types.SimpleNamespace(returncode=0, stdout="PLATFORM=cpu\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench._wait_for_devices()
    assert len(calls) == 1


def test_device_wait_persistent_outage_exits(monkeypatch):
    import subprocess

    monkeypatch.setenv("SPACER_BENCH_DEVICE_WAIT_S", "1")

    def fake_run(*a, timeout=None, **k):
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    with pytest.raises(SystemExit) as e:
        bench._wait_for_devices(max_wait_s=1)
    assert e.value.code == 3
