"""Ring attention (parallel/ring_attention.py) on the 8-virtual-device
mesh: exact equality with dense softmax attention — forward, with key
padding, and gradients through shard_map + ppermute."""

import numpy as np

import jax
import jax.numpy as jnp

from msvit_tpu.parallel import make_mesh
from msvit_tpu.parallel.ring_attention import ring_attention


def _dense(q, k, v, mask=None, scale=None):
    dh = q.shape[-1]
    scale = dh**-0.5 if scale is None else scale
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32)).astype(q.dtype)


def _mesh():
    # 2 data x 4 model over the 8 virtual CPU devices
    return make_mesh(tp=4)


def test_ring_matches_dense():
    mesh = _mesh()
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    b, n, h, dh = 4, 16, 2, 8
    q = jax.random.normal(kq, (b, n, h, dh), jnp.float32)
    k = jax.random.normal(kk, (b, n, h, dh), jnp.float32)
    v = jax.random.normal(kv, (b, n, h, dh), jnp.float32)
    got = ring_attention(q, k, v, mesh)
    want = _dense(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_ring_with_key_padding_mask():
    mesh = _mesh()
    rng = jax.random.PRNGKey(1)
    kq, kk, kv, km = jax.random.split(rng, 4)
    b, n, h, dh = 2, 24, 2, 8
    q = jax.random.normal(kq, (b, n, h, dh), jnp.float32)
    k = jax.random.normal(kk, (b, n, h, dh), jnp.float32)
    v = jax.random.normal(kv, (b, n, h, dh), jnp.float32)
    mask = jax.random.bernoulli(km, 0.7, (b, n))
    mask = mask.at[:, 0].set(True)  # at least one attendable key
    got = ring_attention(q, k, v, mesh, key_padding_mask=mask)
    want = _dense(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_ring_gradients_match_dense():
    mesh = _mesh()
    rng = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(rng, 3)
    b, n, h, dh = 2, 8, 2, 8
    q = jax.random.normal(kq, (b, n, h, dh), jnp.float32)
    k = jax.random.normal(kk, (b, n, h, dh), jnp.float32)
    v = jax.random.normal(kv, (b, n, h, dh), jnp.float32)
    tgt = jax.random.normal(rng, (b, n, h, dh), jnp.float32)

    def loss_ring(q, k, v):
        return jnp.sum((ring_attention(q, k, v, mesh) - tgt) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum((_dense(q, k, v) - tgt) ** 2)

    g_r = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_d = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_r, g_d):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4
        )


def test_ring_rejects_indivisible_tokens():
    mesh = _mesh()
    q = jnp.zeros((1, 10, 2, 8))  # 10 % 4 != 0
    try:
        ring_attention(q, q, q, mesh)
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected ValueError")
