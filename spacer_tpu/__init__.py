"""spacer_tpu — a TPU-native framework for spatially-grounded RLVR on video VLMs.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
OuyangKun10/SpaceR (SG-RLVR training + multi-benchmark video eval), designed
TPU-first: SPMD over a jax.sharding.Mesh, Pallas kernels for the attention /
logprob hot paths, a KV-cached on-mesh sampler instead of vLLM, and FSDP-style
parameter sharding instead of DeepSpeed ZeRO.

Subpackages
-----------
- ``spacer_tpu.vision``   — video/image preprocessing (qwen-vl-utils parity)
- ``spacer_tpu.models``   — Qwen2.5-VL in JAX (windowed ViT + M-RoPE LM)
- ``spacer_tpu.ops``      — Pallas TPU kernels (flash attention, fused logp)
- ``spacer_tpu.parallel`` — mesh construction + parameter partitioning
- ``spacer_tpu.sampler``  — batched KV-cached autoregressive sampler
- ``spacer_tpu.rewards``  — verifiable reward functions (host-side)
- ``spacer_tpu.train``    — GRPO / SG-RLVR / SFT train steps and trainer loop
- ``spacer_tpu.evalharness`` — VSI-Bench & co. evaluation harness
- ``spacer_tpu.data``     — dataset loading and prompt templating
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (big win on remote-compile TPU
    backends where each compile is a network round trip).  Opt out with
    SPACER_NO_COMPILE_CACHE=1; honor an explicit JAX cache dir if set.

    CPU-pinned processes (JAX_PLATFORMS=cpu: the test suite, the multichip
    dryrun) do NOT get the persistent cache: XLA:CPU AOT artifacts bake in
    the compiling host's instruction selection, and loading one compiled
    on a different machine can silently miscompute (observed as NaNs from
    a cached binary whose AVX feature set mismatched the host) — the
    loader itself warns about SIGILL.  CPU compiles are fast; the cache
    only pays for its risk on the remote TPU backend."""
    if _os.environ.get("SPACER_NO_COMPILE_CACHE") == "1":
        return
    if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "spacer_tpu_xla"),
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
