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
    assert _fused_eligible(q_small, q_small, None)
    # measured-OK upper range: 1600² unmasked fits (11MB scores)
    q_1600 = jnp.zeros((1, 1, 1600, 64))
    assert _fused_eligible(q_1600, q_1600, None)
    # ... but not with an f32 additive mask tile sharing VMEM
    fmask = jnp.zeros((1, 1, 1600, 1600), jnp.float32)
    assert not _fused_eligible(q_1600, q_1600, fmask)
    q_big = jnp.zeros((1, 1, 2048, 64))
    assert not _fused_eligible(q_big, q_big, None)  # 2048² f32 > budget


def test_fused_kernel_interpret_mode_matches_xla():
    """Kernel math on CPU via the Pallas interpreter (same code path that
    compiles on TPU), including bool masks and context-extended kv."""
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (2, 4, 37, 16))
    k = jax.random.normal(ks[1], (2, 4, 45, 16))
    v = jax.random.normal(ks[2], (2, 4, 45, 16))
    mask = jax.random.bernoulli(ks[3], 0.8, (2, 1, 37, 45)) | (
        jax.lax.broadcasted_iota(jnp.int32, (37, 45), 1) == 0
    )
    ref, _ = xla_attention(q, k, v, mask=mask)
    out, _ = multi_head_attention(q, k, v, mask=mask, implementation="fused")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_inference_kernel_matches_xla():
    """r5 serving kernel (shaved softmax + transposed PV): matches the
    exact path on bounded post-LN-scale logits, for bool AND additive
    soft masks (the multistate -100 penalty)."""
    from msvit_tpu.ops.fused_attention import fused_attention_inference

    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    q = jax.random.normal(ks[0], (2, 4, 37, 16))
    k = jax.random.normal(ks[1], (2, 4, 45, 16))
    v = jax.random.normal(ks[2], (2, 4, 45, 16))
    bool_mask = jax.random.bernoulli(ks[3], 0.8, (2, 1, 37, 45)) | (
        jax.lax.broadcasted_iota(jnp.int32, (37, 45), 1) == 0
    )
    soft_mask = jnp.where(bool_mask, 0.0, -100.0).astype(jnp.float32)
    for mask in (None, bool_mask, soft_mask):
        ref, _ = xla_attention(q, k, v, mask=mask)
        out = fused_attention_inference(q, k, v, mask=mask)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5,
            err_msg=str(None if mask is None else mask.dtype),
        )


def test_pv_transposed_exactness():
    """The exact kernel's transposed-PV rewrite (r5) must be
    numerically identical to the direct PV dot at f32."""
    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    p = jax.nn.softmax(jax.random.normal(ks[0], (3, 24, 40)), axis=-1)
    v = jax.random.normal(ks[1], (3, 40, 16))
    from msvit_tpu.ops.fused_attention import _pv_transposed

    direct = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(_pv_transposed(p, v)), np.asarray(direct), atol=1e-6
    )


def test_flash_kernel_interpret_mode_matches_xla():
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (1, 2, 37, 16))
    k = jax.random.normal(ks[1], (1, 2, 45, 16))
    v = jax.random.normal(ks[2], (1, 2, 45, 16))
    mask = jax.random.bernoulli(ks[3], 0.8, (1, 1, 37, 45)) | (
        jax.lax.broadcasted_iota(jnp.int32, (37, 45), 1) == 0
    )
    ref, _ = xla_attention(q, k, v, mask=mask)
    out, _ = multi_head_attention(q, k, v, mask=mask, implementation="flash")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
