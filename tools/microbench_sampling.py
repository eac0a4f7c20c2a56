"""On-chip microbench: nucleus sampling cost per decode step at rollout
shapes (B*G=64 rows x 49152 vocab).

Compares, in one fori_loop program each (no dispatch noise):
  gumbel   jax.random.categorical over filtered logits (the SHIPPED form:
           a threefry Gumbel per logit — B x V bits per step)
  invcdf   inverse-CDF variant (bisect nucleus + one cumsum + one uniform
           per row) — measured SLOWER end-to-end on TPU (rollout 3.71 vs
           3.43-3.51 s/iteration): XLA's 49k-lane cumsum costs more than
           the threefry it saves
  greedy   argmax only (the floor: what sampling adds on top of this —
           measured ~nothing end-to-end, 3.43 s/iteration)

Usage: python tools/microbench_sampling.py [rows] [vocab] [steps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(rows=64, vocab=49152, steps=100):
    import jax
    import jax.numpy as jnp

    from spacer_tpu.sampler.sampler import sample_logits

    rng = np.random.default_rng(0)
    logits0 = jnp.asarray(
        rng.normal(size=(rows, vocab)).astype(np.float32) * 3.0)

    def loop(fn):
        @jax.jit
        def run(logits, key):
            def body(i, carry):
                acc, key = carry
                key, sub = jax.random.split(key)
                # perturb so no iteration is hoistable
                t = fn(logits + acc * 1e-30, sub)
                return acc + t.astype(jnp.float32).sum(), key

            return jax.lax.fori_loop(0, steps, body,
                                     (jnp.float32(0), key))[0]

        return run

    def gumbel(lg, key):
        return sample_logits(lg, key, 1.0, 0.95)

    def invcdf(lg, key):
        from spacer_tpu.sampler.sampler import _topp_threshold_bisect

        lg = lg.astype(jnp.float32)
        lse = jax.nn.logsumexp(lg, axis=-1, keepdims=True)
        probs = jnp.exp(lg - lse)
        kept_min = _topp_threshold_bisect(lg, lse, 0.95)
        keep = lg.astype(jnp.bfloat16) >= kept_min.astype(jnp.bfloat16)
        probs = jnp.where(keep, probs, 0.0)
        cdf = jnp.cumsum(probs, axis=-1)
        u = jax.random.uniform(key, (lg.shape[0], 1)) * cdf[:, -1:]
        return jnp.sum((cdf <= u).astype(jnp.int32), axis=-1)

    def greedy(lg, key):
        return jnp.argmax(lg, axis=-1)

    for name, fn in [("gumbel", gumbel), ("invcdf", invcdf),
                     ("greedy", greedy)]:
        run = loop(fn)
        key = jax.random.key(0)
        float(run(logits0, key))  # compile
        t0 = time.perf_counter()
        float(run(logits0, key))
        dt = (time.perf_counter() - t0) / steps
        print(f"{name}: {dt * 1e3:.3f} ms/step "
              f"(x1024 steps = {dt * 1024:.2f} s/iteration)", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
