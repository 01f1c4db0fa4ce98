"""Fused single-pass attention and flash attention vs the XLA reference —
CPU runs use interpret-mode-free XLA fallback paths, so these tests pin
the *dispatch* logic and the pure-JAX reference; kernel numerics are
exercised on TPU (see benchmarks and the verify skill)."""

import numpy as np

import jax
import jax.numpy as jnp

from msvit_tpu.ops.attention import (
    _fused_eligible,
    multi_head_attention,
    xla_attention,
)


def test_auto_dispatch_on_cpu_falls_back_to_xla():
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 197, 64))
    out, probs = multi_head_attention(q, q, q, implementation="auto")
    ref, _ = xla_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert probs is None


def test_output_probs_forces_probs():
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 4))
    out, probs = multi_head_attention(q, q, q, output_probs=True)
    assert probs is not None
    np.testing.assert_allclose(
        np.asarray(jnp.sum(probs, -1)), 1.0, atol=1e-5
    )


def test_fused_eligibility_boundary():
    q_small = jnp.zeros((1, 1, 197, 64))
    assert _fused_eligible(q_small, q_small)
    q_big = jnp.zeros((1, 1, 2048, 64))
    assert not _fused_eligible(q_big, q_big)  # 2048² f32 > 8MB budget
