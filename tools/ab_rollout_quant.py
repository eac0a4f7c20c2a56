"""RL-quality A/Bs: (a) bf16 vs int8_kv ROLLOUT decode (VERDICT r3 #3),
(b) float32 vs int8 Adam MOMENTS (VERDICT r4 #6).

Does quantizing the rollout's sampling distribution (int8 weights + int8 KV,
ops/quant.py, ~0.5% RMS logit perturbation) — or quantizing the optimizer's
moment storage (train/optimizer.py blockwise int8, the bitsandbytes role) —
change RL training dynamics?  Arms train a tiny model from the SAME init on
a reward the policy can actually learn at tiny scale — fraction of emitted
token ids below 200 (GRPO shifts mass onto low ids; varies within groups so
advantages are nonzero from step 0).

Noise floor: each arm runs at MULTIPLE seeds (default 3 — ADVICE r4 asked
for more than the original single reseed); the baseline seed-to-seed spread
(max - min of the bf16/f32 finals) calibrates what "no effect" looks like.

Decision rule (printed): if |mean(treated finals) - mean(baseline finals)|
on final-10-step mean reward and mean |KL| is within the baseline
seed-to-seed spread, the treatment is RL-indistinguishable at this scale
and may ship as the default.  CAVEAT (documented in SGRLVRConfig too): the
reward here is synthetic — a realistic-reward A/B (cogmap/accuracy on real
CoT text) needs a real tokenizer + checkpoint, which this environment
cannot mount; revisit when one exists.

Run (TPU or CPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/ab_rollout_quant.py [steps] [rollout_quant|moments]
Writes tools/ab_rollout_quant.json / tools/ab_moments.json.
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


def run_arm(name, seed, steps, video, *, decode_quant=None,
            moment_dtype="float32"):
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
        moment_dtype=moment_dtype,
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


def _stats(a):
    tail = slice(-10, None)
    return {
        "final_reward": float(np.mean(a["reward"][tail])),
        "mean_kl": float(np.mean(a["kl"])),
        "final_len": float(np.mean(a["completion_length"][tail])),
        "learned": float(np.mean(a["reward"][tail])
                         - np.mean(a["reward"][:10])),
    }


def run_ab(mode, steps=50, seeds=(0, 1, 2)):
    """mode 'rollout_quant': baseline decode_quant=None vs int8_kv.
    mode 'moments': baseline moment_dtype float32 vs int8 (rollout fixed
    at the shipped int8_kv in BOTH arms so the comparison isolates the
    optimizer)."""
    video = make_video("/tmp/ab_clip.mp4")
    if mode == "rollout_quant":
        base_kw = {"decode_quant": None}
        treat_kw = {"decode_quant": "int8_kv"}
        base_name, treat_name = "bf16", "int8kv"
        out_file = "ab_rollout_quant.json"
    elif mode == "rollout_quant4":
        # int4 weights (ops/int4_matmul.py) vs the bf16 ground truth —
        # gates whether int4_kv may ever leave opt-in status
        base_kw = {"decode_quant": None}
        treat_kw = {"decode_quant": "int4_kv"}
        base_name, treat_name = "bf16", "int4kv"
        out_file = "ab_rollout_quant4.json"
    elif mode == "moments":
        base_kw = {"decode_quant": "int8_kv", "moment_dtype": "float32"}
        treat_kw = {"decode_quant": "int8_kv", "moment_dtype": "int8"}
        base_name, treat_name = "f32mom", "int8mom"
        out_file = "ab_moments.json"
    else:
        raise ValueError(mode)

    arms = {}
    for s in seeds:
        arms[f"{base_name}_s{s}"] = run_arm(
            f"{base_name}_s{s}", s, steps, video, **base_kw)
        arms[f"{treat_name}_s{s}"] = run_arm(
            f"{treat_name}_s{s}", s, steps, video, **treat_kw)

    st = {k: _stats(v) for k, v in arms.items()}
    base_fin = [st[f"{base_name}_s{s}"]["final_reward"] for s in seeds]
    treat_fin = [st[f"{treat_name}_s{s}"]["final_reward"] for s in seeds]
    base_kl = [st[f"{base_name}_s{s}"]["mean_kl"] for s in seeds]
    treat_kl = [st[f"{treat_name}_s{s}"]["mean_kl"] for s in seeds]

    delta_reward = abs(float(np.mean(treat_fin)) - float(np.mean(base_fin)))
    spread_reward = float(np.max(base_fin) - np.min(base_fin))
    delta_kl = abs(float(np.mean(treat_kl)) - float(np.mean(base_kl)))
    spread_kl = float(np.max(base_kl) - np.min(base_kl))
    verdict = ("INDISTINGUISHABLE"
               if delta_reward <= max(spread_reward, 0.02)
               and delta_kl <= max(spread_kl, 0.002)
               else "DISTINGUISHABLE")
    out = {"mode": mode, "steps": steps, "seeds": list(seeds), "arms": st,
           "quant_delta_reward": delta_reward,
           "seed_spread_reward": spread_reward,
           "quant_delta_kl": delta_kl, "seed_spread_kl": spread_kl,
           "verdict": verdict,
           "caveat": ("synthetic lowid reward on a tiny random-init model; "
                      "a realistic-reward A/B needs a mounted checkpoint"),
           "curves": arms}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), out_file)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "curves"},
                     indent=1))
    return out


def main(steps=50, mode="rollout_quant", n_seeds=3):
    run_ab(mode, steps, seeds=tuple(range(n_seeds)))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50,
         sys.argv[2] if len(sys.argv) > 2 else "rollout_quant",
         int(sys.argv[3]) if len(sys.argv) > 3 else 3)
