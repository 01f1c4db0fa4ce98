"""Packed-layout fused attention: parity vs the XLA reference path and
gradient flow (CPU interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from msvit_tpu.ops.attention import xla_attention
from msvit_tpu.ops.packed_attention import packed_attention

B, N, D, H = 2, 37, 48, 4


def _reference(qkv, mask=None):
    dh = D // H
    t = qkv.reshape(B, N, 3, H, dh).transpose(2, 0, 3, 1, 4)
    out, _ = xla_attention(t[0], t[1], t[2], mask=mask)
    return jnp.swapaxes(out, 1, 2).reshape(B, N, D)


def _qkv(seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, N, 3 * D),
                             dtype=jnp.float32)


def test_packed_matches_xla():
    qkv = _qkv()
    got = packed_attention(qkv, H)
    want = _reference(qkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_packed_bool_mask():
    qkv = _qkv(1)
    mask = jax.random.bernoulli(jax.random.PRNGKey(2), 0.7, (B, 1, N, N))
    # keep at least the diagonal attendable
    eye = jnp.eye(N, dtype=bool)[None, None]
    mask = jnp.logical_or(mask, eye)
    got = packed_attention(qkv, H, mask=mask)
    want = _reference(qkv, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_packed_float_mask_per_head():
    qkv = _qkv(3)
    mask = -100.0 * jax.random.bernoulli(
        jax.random.PRNGKey(4), 0.3, (B, H, N, N)
    ).astype(jnp.float32)
    got = packed_attention(qkv, H, mask=mask)
    want = _reference(qkv, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_packed_gradients_match():
    qkv = _qkv(5)

    def loss_packed(qkv):
        return jnp.sum(packed_attention(qkv, H) ** 2)

    def loss_ref(qkv):
        return jnp.sum(_reference(qkv) ** 2)

    g1 = jax.grad(loss_packed)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=5e-2, rtol=5e-2)


def test_packed_int8_close_to_bf16():
    from msvit_tpu.ops.packed_attention import packed_attention_int8

    qkv = _qkv(7) * 0.5
    want = np.asarray(_reference(qkv), dtype=np.float32)

    sec = jnp.max(jnp.abs(qkv.reshape(-1, 3, D)), axis=(0, 2)) / 127.0
    qkv_q = jnp.clip(
        jnp.round(qkv / jnp.repeat(sec, D)), -127, 127
    ).astype(jnp.int8)
    got = np.asarray(
        packed_attention_int8(qkv_q, sec, H), dtype=np.float32
    )
    cos = np.sum(got * want) / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.995, cos

    # int8-out flavor round-trips through the output scale
    s_out = np.abs(want).max() / 127.0
    got_q = np.asarray(
        packed_attention_int8(
            qkv_q, sec, H, out_inv_scale=1.0 / s_out, int8_out=True
        ),
        dtype=np.float32,
    ) * s_out
    cos_q = np.sum(got_q * want) / (
        np.linalg.norm(got_q) * np.linalg.norm(want)
    )
    assert cos_q > 0.99, cos_q


def test_packed_pallas_backward_matches_xla():
    """The packed custom-VJP backward (shared flash dQ/dKV kernels fed by
    the per-head lse residual) agrees with differentiating the XLA
    reference — with and without masks."""
    for seed, use_mask in [(3, False), (4, True)]:
        qkv = _qkv(seed)
        mask = None
        if use_mask:
            mask = jax.random.bernoulli(
                jax.random.PRNGKey(9), 0.8, (B, 1, N, N)
            )
            mask = jnp.logical_or(mask, jnp.eye(N, dtype=bool)[None, None])

        def loss_packed(x):
            return jnp.sum(packed_attention(x, H, mask=mask) ** 2)

        def loss_ref(x):
            return jnp.sum(_reference(x, mask=mask) ** 2)

        g_packed = jax.grad(loss_packed)(qkv)
        g_ref = jax.grad(loss_ref)(qkv)
        np.testing.assert_allclose(
            np.asarray(g_packed), np.asarray(g_ref), atol=3e-2, rtol=3e-2
        )


def test_packed_grouped_matches_reference():
    """The head-grouped packed kernel (mid-length regime) matches the XLA
    reference, forward and backward, with and without masks."""
    from msvit_tpu.ops.packed_attention import (
        _packed_forward_grouped,
        grouped_vmem_ok,
        packed_attention,
    )

    assert grouped_vmem_ok(816, D, H, head_group=2) or D // H != 64

    for seed, use_mask in [(5, False), (6, True)]:
        qkv = _qkv(seed)
        mask = None
        if use_mask:
            mask = (
                jax.random.bernoulli(jax.random.PRNGKey(8), 0.5, (B, 1, N, N))
                * -100.0
            ).astype(jnp.float32)  # additive float (multistate-style)
        want = _reference(qkv, mask=mask)
        got = _packed_forward_grouped(
            qkv, mask, H, 1.0 / (D // H) ** 0.5, -1e30, head_group=2
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
        )

        # the custom-vjp wrapper picks the grouped path when the all-heads
        # footprint is too big; emulate by calling grads through
        # packed_attention on the same inputs (gradient correctness of the
        # shared backward already covered; here check value dispatch)
        out = packed_attention(qkv, H, mask=mask)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), atol=2e-2, rtol=2e-2
        )


def test_packed_backward_impls_agree():
    """All four backward implementations behind the packed custom VJP —
    the packed-layout Pallas kernel (r3), the head-grouped scratch
    variant (r3), the closed-form XLA math, and the flash dQ/dKV kernels
    — produce the same dqkv (vs XLA autodiff)."""
    import msvit_tpu.ops.packed_attention as pa

    for use_mask in (False, True):
        qkv = _qkv(11 + use_mask)
        mask = None
        if use_mask:
            mask = jax.random.bernoulli(
                jax.random.PRNGKey(13), 0.8, (B, 1, N, N)
            )
            mask = jnp.logical_or(mask, jnp.eye(N, dtype=bool)[None, None])

        def loss_packed(x):
            return jnp.sum(packed_attention(x, H, mask=mask) ** 2)

        def loss_ref(x):
            return jnp.sum(_reference(x, mask=mask) ** 2)

        g_ref = jax.grad(loss_ref)(qkv)
        old = pa._BWD_IMPL
        try:
            for impl in ("kernel", "grouped", "closed", "flash"):
                pa._BWD_IMPL = impl
                g = jax.jit(jax.grad(loss_packed))(qkv)
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(g_ref), atol=3e-2, rtol=3e-2,
                    err_msg=f"impl={impl} mask={use_mask}",
                )
        finally:
            pa._BWD_IMPL = old


def test_packed_grouped_backward_per_head_mask():
    """The head-grouped backward's hg-sliced mask BlockSpec (per-head
    additive masks, multistate-style) agrees with XLA autodiff."""
    import msvit_tpu.ops.packed_attention as pa

    qkv = _qkv(17)
    mask = (
        jax.random.bernoulli(jax.random.PRNGKey(18), 0.5, (B, H, N, N))
        * -100.0
    ).astype(jnp.float32)

    def loss_packed(x):
        return jnp.sum(packed_attention(x, H, mask=mask) ** 2)

    def loss_ref(x):
        return jnp.sum(_reference(x, mask=mask) ** 2)

    g_ref = jax.grad(loss_ref)(qkv)
    old = pa._BWD_IMPL
    try:
        pa._BWD_IMPL = "grouped"
        g = jax.jit(jax.grad(loss_packed))(qkv)
    finally:
        pa._BWD_IMPL = old
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), atol=3e-2, rtol=3e-2
    )


def test_packed_training_stable_at_large_logits():
    """r4 regression: the training forward/backward must survive attention
    logits far past the old ±80 clamp (the no-max shaved softmax
    overflowed: N·e⁸⁰·|v| > f32 max, and the clipped lse blew up the
    backward's exp(s − lse)).  Scores here reach ~±340."""
    import msvit_tpu.ops.packed_attention as pa

    qkv = _qkv(21) * jnp.concatenate(
        [jnp.full((D,), 12.0), jnp.full((D,), 12.0), jnp.ones((D,))]
    )

    def loss_packed(x):
        return jnp.sum(packed_attention(x, H) ** 2)

    def loss_ref(x):
        return jnp.sum(_reference(x) ** 2)

    # sanity: logits really are far beyond the old clamp
    dh = D // H
    t = qkv.reshape(B, N, 3, H, dh).transpose(2, 0, 3, 1, 4)
    smax = jnp.max(
        jnp.einsum("bhqe,bhke->bhqk", t[0], t[1]) / jnp.sqrt(1.0 * dh)
    )
    assert float(smax) > 150.0, float(smax)

    val, g = jax.value_and_grad(loss_packed)(qkv)
    val_ref, g_ref = jax.value_and_grad(loss_ref)(qkv)
    assert bool(jnp.isfinite(val)) and bool(jnp.isfinite(g).all())
    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), atol=3e-2, rtol=3e-2
    )

    old = pa._BWD_IMPL
    try:  # the grouped backward path too (the mid/long training regime)
        pa._BWD_IMPL = "grouped"
        g2 = jax.jit(jax.grad(loss_packed))(qkv)
        assert bool(jnp.isfinite(g2).all())
        np.testing.assert_allclose(
            np.asarray(g2), np.asarray(g_ref), atol=3e-2, rtol=3e-2
        )
    finally:
        pa._BWD_IMPL = old
