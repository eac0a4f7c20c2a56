"""RL-quality A/B: bf16 vs int8_kv ROLLOUT decode (VERDICT r3 #3).

Does quantizing the rollout's sampling distribution (int8 weights + int8 KV,
ops/quant.py, ~0.5% RMS logit perturbation) change RL training dynamics?
Two GRPO arms train a tiny model from the SAME init/seed on a reward the
policy can actually learn at tiny scale — fraction of emitted token ids
below 200 (GRPO shifts mass onto low ids; varies within groups so
advantages are nonzero from step 0).  A third arm re-runs bf16 with a
different seed to calibrate the between-seed noise floor.

Decision rule (printed): if |int8_kv - bf16| on final-10-step mean reward
and mean |KL| is within the bf16 seed-to-seed spread, the quantized rollout
is RL-indistinguishable at this scale and may ship as the default.

Run (TPU or CPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/ab_rollout_quant.py [steps]
Writes tools/ab_rollout_quant.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_video(path):
    import cv2

    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                        (128, 96))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (96, 128, 3), np.uint8)
    for t in range(60):
        w.write(np.roll(base, t * 3, axis=1))
    w.release()
    return path


def lowid_reward(completions, solution, **kw):
    """Fraction of emitted tokens with id < 200 (MockTokenizer decodes as
    'wNNN').  Learnable at tiny scale — GRPO shifts mass onto low ids —
    with natural within-group variance, so advantages are nonzero from
    step 0."""
    out = []
    for c in completions:
        ids = [int(t[1:]) for t in c[0]["content"].split()
               if t[:1] == "w" and t[1:].isdigit()]
        out.append(float(np.mean([i < 200 for i in ids])) if ids else 0.0)
    return out


def run_arm(name, decode_quant, seed, steps, video):
    import jax
    import jax.numpy as jnp

    from spacer_tpu.data import MockTokenizer, VLProcessor
    from spacer_tpu.data.templates import make_conversation
    from spacer_tpu.models.qwen25_vl import tiny_config, init_params
    from spacer_tpu.train.trainer import SGRLVRConfig, SGRLVRTrainer

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)  # same init
    tok = MockTokenizer(vocab_size=cfg.text.vocab_size)
    proc = VLProcessor(tok, cfg, min_pixels=3136, max_pixels=401408)
    row = {"problem": "Describe.", "problem_type": "numerical",
           "solution": "<answer>3</answer>", "path": video,
           "data_type": "video", "data_source": "SR_dataset",
           "problem_id": 0}
    row.update(make_conversation(row, None))
    args = SGRLVRConfig(
        num_generations=8, max_prompt_length=512, max_completion_length=24,
        learning_rate=5e-4, beta=0.04, temporal=False, len_control=False,
        max_steps=steps, output_dir=f"/tmp/ab_{name}", prompt_bucket=128,
        remat=False, logp_chunk=16, seed=seed, decode_quant=decode_quant,
        moment_dtype="float32",
    )
    tr = SGRLVRTrainer(cfg, params, proc, [lowid_reward],
                       [row] * steps, args)
    rng = np.random.default_rng(seed)
    rewards, kls, lens = [], [], []
    for i in range(steps):
        tr.training_step(tr.dataset[i], rng)
        rewards.append(tr._metrics["reward"][-1])
        kls.append(abs(tr._metrics["kl"][-1]))
        lens.append(tr._metrics["completion_length"][-1])
    return {"reward": rewards, "kl": kls, "completion_length": lens}


def main(steps=50):
    video = make_video("/tmp/ab_clip.mp4")
    arms = {
        "bf16_s0": run_arm("bf16_s0", None, 0, steps, video),
        "int8kv_s0": run_arm("int8kv_s0", "int8_kv", 0, steps, video),
        "bf16_s1": run_arm("bf16_s1", None, 1, steps, video),
    }
    tail = slice(-10, None)

    def stats(a):
        return {
            "final_reward": float(np.mean(a["reward"][tail])),
            "mean_kl": float(np.mean(a["kl"])),
            "final_len": float(np.mean(a["completion_length"][tail])),
            "learned": float(np.mean(a["reward"][tail])
                             - np.mean(a["reward"][:10])),
        }

    s = {k: stats(v) for k, v in arms.items()}
    quant_delta = abs(s["int8kv_s0"]["final_reward"]
                      - s["bf16_s0"]["final_reward"])
    seed_delta = abs(s["bf16_s1"]["final_reward"]
                     - s["bf16_s0"]["final_reward"])
    kl_quant = abs(s["int8kv_s0"]["mean_kl"] - s["bf16_s0"]["mean_kl"])
    kl_seed = abs(s["bf16_s1"]["mean_kl"] - s["bf16_s0"]["mean_kl"])
    verdict = ("INDISTINGUISHABLE" if quant_delta <= max(seed_delta, 0.02)
               and kl_quant <= max(kl_seed, 0.002) else "DISTINGUISHABLE")
    out = {"steps": steps, "arms": s,
           "quant_delta_reward": quant_delta,
           "seed_delta_reward": seed_delta,
           "quant_delta_kl": kl_quant, "seed_delta_kl": kl_seed,
           "verdict": verdict,
           "curves": arms}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ab_rollout_quant.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "curves"},
                     indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
