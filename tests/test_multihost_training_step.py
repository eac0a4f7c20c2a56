"""FULL cross-process SGRLVRTrainer.training_step (VERDICT r3 #5).

Two jax.distributed processes (4 virtual CPU devices each -> one global
8-device mesh) each own ONE video prompt; `training_step` runs end-to-end on
both: per-host video decode + processor encode, the multi-host encoding
exchange, ONE global sampler rollout on the global mesh (the sampler's
multi-process placement path), per-host reward scoring + the reward gather,
and one global optimizer update.  loss/kl/grad_norm/reward must equal a
single-process run over the same two rows to 1e-5 — the torchrun-equivalence
proof at the full-training-step level (the reference never trains
single-process: run_SpaceR_SG_RLVR.sh:9-13).

The train-STEP-only variant (pre-built synthetic batch) lives in
test_multihost_train_step.py; this test is the one that forces the sampler's
multi-process story (global arrays in generate) to exist.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.slow

# Shared model/data builder, used VERBATIM by the workers (exec'd source) and
# the in-process single-process reference.
COMMON = textwrap.dedent("""
    import numpy as np

    def build_trainer(video_path, mesh, out_dir):
        import jax
        import jax.numpy as jnp

        from spacer_tpu.data import MockTokenizer, VLProcessor
        from spacer_tpu.data.templates import make_conversation
        from spacer_tpu.models.qwen25_vl import tiny_config, init_params
        from spacer_tpu.parallel import shard_params
        from spacer_tpu.rewards import accuracy_reward, format_reward
        from spacer_tpu.train.trainer import SGRLVRConfig, SGRLVRTrainer

        cfg = tiny_config()
        params = init_params(jax.random.key(0), cfg, jnp.float32)
        params, _ = shard_params(params, mesh)
        tok = MockTokenizer(vocab_size=cfg.text.vocab_size)
        proc = VLProcessor(tok, cfg, min_pixels=3136, max_pixels=401408)

        rows = []
        video_id = video_path.rsplit('/', 1)[-1].rsplit('.', 1)[0]
        map_data = {video_id: {
            "cognitive_map": {"chair": [[1, 2], [5, 5]], "table": [[8, 8]]},
            "object_list": ["chair", "table"],
        }}
        for i in range(2):
            row = {
                "problem": f"How many chairs are visible? ({i})",
                "problem_type": "numerical",
                "solution": "<answer>3</answer>",
                "path": video_path,
                "data_type": "video",
                "data_source": "SR_dataset",
                "problem_id": i,
            }
            row.update(make_conversation(row, map_data))
            rows.append(row)

        args = SGRLVRConfig(
            num_generations=4,
            max_prompt_length=512,
            max_completion_length=8,
            learning_rate=1e-4,
            temperature=0.0,       # greedy: rollout parity across topologies
            temporal=False,        # per-host shuffle rngs differ by design
            len_control=True,
            max_steps=1,
            output_dir=out_dir,
            prompt_bucket=128,
            remat=False,
            logp_chunk=16,
            attn_impl="xla",
            decode_quant=None,
        )
        trainer = SGRLVRTrainer(
            cfg, params, proc, [accuracy_reward, format_reward], rows, args,
            map_data=map_data, mesh=mesh,
        )
        return trainer, rows

    def step_summary(trainer, metrics):
        m = trainer._metrics
        return {
            "loss": float(metrics["loss"]),
            "kl": float(metrics["kl"]),
            "grad_norm": float(metrics["grad_norm"]),
            "reward": m["reward"][-1],
            "completion_length": m["completion_length"][-1],
            "accuracy": m["rewards/accuracy_reward"][-1],
            "format": m["rewards/format_reward"][-1],
        }
""")

WORKER = COMMON + textwrap.dedent("""
    import os, sys, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"

    from spacer_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=sys.argv[1],
        num_processes=2,
        process_id=int(sys.argv[2]),
    )

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    assert jax.process_count() == 2
    rank = jax.process_index()
    # data=2 x fsdp=4: the rollout batch (2 global rows) shards over the
    # data axis, so each host's devices decode ONLY their own row
    mesh = multihost.global_mesh(fsdp=4)

    video_path, out_dir = sys.argv[3], sys.argv[4]
    trainer, rows = build_trainer(video_path, mesh, out_dir + f"/r{rank}")

    # host `rank` owns row `rank`; the rollout/update are global
    rng = np.random.default_rng(0)
    metrics = trainer.training_step([rows[rank]], rng)

    # VERDICT r4 #2: the decode program's input sharding must PARTITION the
    # batch axis (rollout compute scales with data), not replicate it
    spec = trainer.sampler.last_rollout_spec
    assert spec is not None and len(spec) > 0 and spec[0], (
        "rollout inputs were not batch-sharded: %r" % (spec,))
    assert "data" in (spec[0] if isinstance(spec[0], tuple) else (spec[0],))
    print("METRICS " + json.dumps(
        dict(step_summary(trainer, metrics), rank=rank,
             rollout_spec=str(spec))), flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("vid") / "clip1.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                        (128, 96))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (96, 128, 3), np.uint8)
    for t in range(60):
        w.write(np.roll(base, t * 3, axis=1))
    w.release()
    return path


def _single_process_reference(video_path, out_dir):
    import jax

    from spacer_tpu.parallel import create_mesh

    ns = {}
    exec(COMMON, ns)
    mesh = create_mesh({"data": 1, "fsdp": 8, "tp": 1})
    trainer, rows = ns["build_trainer"](video_path, mesh, out_dir)
    with jax.default_matmul_precision("highest"):
        metrics = trainer.training_step(rows, np.random.default_rng(0))
    return ns["step_summary"](trainer, metrics)


def test_two_process_full_training_step(video_path, tmp_path):
    expected = _single_process_reference(video_path, str(tmp_path / "ref"))

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    coord = f"localhost:{_free_port()}"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    env.get("PYTHONPATH", "")] if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i), video_path,
             str(tmp_path / "w")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    got = {}
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-6000:]}"
        line = [l for l in out.splitlines() if l.startswith("METRICS ")]
        assert line, out[-2000:]
        got[i] = json.loads(line[0][len("METRICS "):])

    for rank in (0, 1):
        # rewards/lengths are exact (greedy rollout parity is bit-level)
        assert got[rank]["reward"] == expected["reward"]
        assert got[rank]["accuracy"] == expected["accuracy"]
        assert got[rank]["format"] == expected["format"]
        assert got[rank]["completion_length"] == expected["completion_length"]
        np.testing.assert_allclose(got[rank]["loss"], expected["loss"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got[rank]["grad_norm"],
                                   expected["grad_norm"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got[rank]["kl"], expected["kl"],
                                   atol=1e-6)
