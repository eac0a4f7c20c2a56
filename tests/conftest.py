"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Multi-chip TPU hardware is not available in CI; all sharding/collective tests
run against 8 virtual CPU devices, which exercises the same SPMD partitioner
paths XLA uses on a real ICI mesh.
"""

import os

# Must be set before `import jax` anywhere in the test process. Force (not
# setdefault): the driver environment pre-sets JAX_PLATFORMS=axon (TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
# No persistent compilation cache on CPU: XLA:CPU AOT artifacts bake in the
# compiling host's instruction selection, and this image's shared cache can
# hold entries from a DIFFERENT machine — loading one silently miscomputes
# (observed: NaNs from a cached MoE binary; the loader warns about SIGILL).
# CPU compiles are fast; determinism matters more here.
os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"
# Single-threaded OpenMP: torch (libgomp) and XLA:CPU's oneDNN in one
# process race when both spin up OpenMP pools — observed as rare NaNs in
# XLA outputs of torch-parity tests.  The torch references here are tiny.
os.environ["OMP_NUM_THREADS"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's collective watchdog aborts the process (SIGABRT) when any
# rendezvous participant is >40s late.  On this 1-core host the 8 virtual
# devices time-share one core, so a 7B-geometry forward legitimately keeps
# some participants busy for minutes before they reach the all-reduce
# (observed: rendezvous.cc "Termination timeout ... exceeded" killing the
# SPACER_FULL_7B dress rehearsal).  Deadlock detection is not worth killing
# correct-but-slow runs; give it two hours.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    flags = (flags
             + " --xla_cpu_collective_call_terminate_timeout_seconds=7200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The environment's sitecustomize registers a TPU PJRT plugin at interpreter
# start and pins the platform regardless of env vars; the config-level update
# below wins as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# JAX's CPU backend (oneDNN) does reduced-precision f32 matmuls by default
# (~1e-3 error); parity tests need true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 virtual devices, got {len(devs)}"
    return devs


# ---------------------------------------------------------------------------
# Slow-test marking: the tests below dominate suite wall time (multi-program
# XLA compiles); the default loop deselects them via addopts -m 'not slow'
# (pyproject.toml) so day-to-day iteration stays under ~5 minutes.  The FULL
# suite still runs with `make test-all`, `pytest -m ""`, or SPACER_RUN_SLOW=1.
# ---------------------------------------------------------------------------

_SLOW_TESTS = {
    "test_cli.py::test_train_sg_rlvr_cli",
    "test_cli.py::test_train_sft_cli",
    "test_global_batch.py::test_multi_prompt_step_matches_per_group_losses",
    "test_global_batch.py::test_trainer_global_batch_on_mesh",
    "test_trainer_e2e.py::test_trainer_two_steps_and_checkpoint",
    "test_train_step.py::test_grpo_step_sharded",
    "test_train_step.py::test_sft_step",
    "test_train_step.py::test_shared_prefix_schema_matches_packed",
    "test_sampler.py::test_sample_logits_top_p",
    "test_ring_train_step.py::test_grpo_step_with_ring_attention",
    "test_ring_lm_forward.py::test_lm_forward_ring_gradients",
    "test_vit_window_kernel.py::test_kernel_path_gradients_match_xla",
    "test_vit_window_kernel.py::test_kernel_path_matches_xla",
    "test_vit_window_kernel.py::test_kernel_path_with_remat",
    "test_serving.py::test_engine_generate_many_matches_generate",
    "test_serving.py::test_generate_many_buckets_prompt_lengths",
    "test_serving.py::test_batcher_with_mesh_sharded_params",
    "test_serving.py::test_batcher_serves_aria_family",
    "test_serving.py::test_batcher_matches_sampler_with_refill",
    "test_serving.py::test_batcher_int8_kv_runs_with_refill",
    "test_aria_trainer_e2e.py::test_aria_trainer_two_steps",
    "test_aria_sharded.py::test_aria_grpo_step_on_mesh",
    "test_checkpoint_topology.py::test_save_fsdp8_restore_other_topologies",
    "test_flash_attention.py::test_gradient_parity",
    "test_engine.py::test_engine_mixed_image_video_batch",
    "test_moe.py::test_moe_grads_flow",
    "test_model_parity.py::test_kv_cache_decode_matches_full_forward",
    "test_7b_readiness.py::test_streaming_load_7b_geometry",
    "test_multihost_train_step.py::test_two_process_grpo_train_step",
    "test_trainer_e2e.py::test_merged_temporal_rollout_matches_sequential",
    # re-marked 2026-08-18 (fast loop had grown to 13 min on the 1-core
    # host; --durations=25 offenders >= 11s moved here, keeping the crash
    # regressions and one core parity test per feature in the default loop)
    "test_cli.py::test_serve_cli",
    "test_aria_parity.py::test_text_decode_matches_forward",
    "test_aria_parity.py::test_full_model_parity_with_image",
    "test_aria_generate.py::test_greedy_image_generation_matches_hf",
    "test_train_step.py::test_grpo_step_beta_zero_no_ref",
    "test_flash_decode.py::test_decode_loop_head_major_matches_einsum",
    "test_flash_decode.py::test_batcher_head_major_aria_family",
    "test_pipeline.py::test_grpo_step_with_pipeline",
    "test_pipeline.py::test_sft_step_with_pipeline",
    "test_pipeline.py::test_pipeline_train_step_grad_parity",
    "test_quant.py::test_int8_kv_segmented_decode_prefix_deterministic",
    "test_quant.py::test_int8_kv_decode_step_logits_close",
    "test_quant.py::test_int8_decode_runs_on_moe_family",
    "test_positions_and_batching.py::test_multi_video_batch_forward_scatter",
    "test_eval_real_engine.py::test_sparbench_real_engine_continuous",
    "test_eval_batched.py::test_eval_batch4_matches_batch1",
    "test_speculative.py::test_speculative_quantized",
    "test_speculative.py::test_speculative_with_mesh_sharded_params",
    "test_offload.py::test_update_with_host_resident_state_matches_device",
    "test_serving.py::test_batcher_single_chunk_all_slots",
}


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPACER_RUN_SLOW"):
        # neutralize the default deselection: treat every test as fast
        return
    for item in items:
        base = item.nodeid.split("tests/")[-1].split("[")[0]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
