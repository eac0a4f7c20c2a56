"""utils/profiling.py + utils/debugging.py: the SURVEY section-5 aux hooks
actually function (the reference has none of these — SURVEY.md section 5)."""

import time

import jax
import jax.numpy as jnp

from spacer_tpu.utils.debugging import (
    disabled_jit,
    enable_nan_checks,
    interpret_kernels,
)
from spacer_tpu.utils.profiling import StepTimer, annotate, trace


def test_step_timer_splits():
    st = StepTimer()
    time.sleep(0.01)
    st.mark("rollout")
    time.sleep(0.01)
    st.mark("update")
    s = st.splits()
    assert list(s) == ["rollout", "update"]
    assert all(v > 0 for v in s.values())


def test_profiler_trace_and_annotation(tmp_path):
    with trace(str(tmp_path)):
        with annotate("unit-test-region"):
            float(jnp.ones(8).sum())
    # the JAX profiler writes a plugins/profile/<ts>/ tree
    assert any(tmp_path.rglob("*.xplane.pb")) or any(tmp_path.iterdir())


def test_nan_checks_toggle():
    enable_nan_checks(True)
    assert jax.config.jax_debug_nans
    enable_nan_checks(False)
    assert not jax.config.jax_debug_nans


def test_disabled_jit_context():
    with disabled_jit():
        assert jax.config.jax_disable_jit
        assert float(jax.jit(lambda x: x + 1)(jnp.float32(1.0))) == 2.0
    assert not jax.config.jax_disable_jit


def test_interpret_kernels_context():
    from spacer_tpu.ops.flash_attention import flash_attention

    q = jnp.zeros((1, 128, 2, 16), jnp.float32)
    with interpret_kernels():
        out = flash_attention(q, q, q, causal=True)
    assert out.shape == q.shape
