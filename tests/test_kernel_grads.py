"""Custom-VJP gradients of the Pallas kernels (interpret mode on CPU):
the declared backward (the Pallas flash dQ/dKV kernels rebuilt from the
saved lse residual — ops/flash_attention.py) must match differentiating
the XLA reference directly, for both q/k/v, masked and unmasked."""

import numpy as np

import jax
import jax.numpy as jnp

from msvit_tpu.ops.attention import xla_attention
from msvit_tpu.ops.flash_attention import flash_attention
from msvit_tpu.ops.fused_attention import fused_attention


def _grads(fn, q, k, v, mask):
    def loss(q_, k_, v_):
        out = fn(q_, k_, v_, mask)
        return jnp.sum(out**2)

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


def test_kernel_grads_match_xla():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (1, 2, 24, 8))
    k = jax.random.normal(ks[1], (1, 2, 30, 8))
    v = jax.random.normal(ks[2], (1, 2, 30, 8))
    mask = jax.random.bernoulli(ks[3], 0.8, (1, 1, 24, 30)) | (
        jax.lax.broadcasted_iota(jnp.int32, (24, 30), 1) == 0
    )

    ref = _grads(lambda q_, k_, v_, m: xla_attention(q_, k_, v_, mask=m)[0],
                 q, k, v, mask)
    for name, fn in (
        ("fused", lambda q_, k_, v_, m: fused_attention(q_, k_, v_, mask=m)),
        ("flash", lambda q_, k_, v_, m: flash_attention(q_, k_, v_, mask=m)),
    ):
        got = _grads(fn, q, k, v, mask)
        for g, r in zip(got, ref):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=1e-4, err_msg=name
            )
