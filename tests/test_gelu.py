"""Fast erf-exact GELU (ops/gelu.py): value and gradient accuracy vs
jax.nn.gelu(approximate=False) / scipy erf, and bf16 equivalence."""

import numpy as np
from scipy.special import erf as scipy_erf

import jax
import jax.numpy as jnp

from msvit_tpu.ops.gelu import erf, erf_tanh, gelu_erf, gelu_erf_tanh


def _xs():
    return np.concatenate(
        [
            np.linspace(-10, 10, 4001),
            np.array([0.0, 1e-8, -1e-8, 30.0, -30.0, 1e4, -1e4]),
        ]
    ).astype(np.float32)


def test_erf_accuracy():
    x = _xs()
    got = np.asarray(erf(jnp.asarray(x)))
    want = scipy_erf(x.astype(np.float64))
    # A&S bound is 1.5e-7 in f64; f32 evaluation rounds to ~4e-7
    assert np.max(np.abs(got - want)) <= 6e-7


def test_erf_tanh_accuracy():
    x = _xs()
    got = np.asarray(erf_tanh(jnp.asarray(x)))
    want = scipy_erf(x.astype(np.float64))
    # fitted minimax bound (benchmarks session r3)
    assert np.max(np.abs(got - want)) <= 5e-5


def _true_gelu(x64):
    return x64 * 0.5 * (1.0 + scipy_erf(x64 / np.sqrt(2.0)))


def test_gelu_erf_tanh_bf16_faithful():
    """The serving default ("gelu" = tanh-form erf) on bf16 inputs stays
    within ~1 bf16 ulp of the TRUE gelu.  (XLA's own bf16 erf-gelu is
    1-2 ulp off — it evaluates erf in bf16 — so truth, not XLA, is the
    oracle here.)"""
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(8192,)).astype(np.float32) * 3
    ).astype(jnp.bfloat16)
    a = np.asarray(gelu_erf_tanh(x).astype(jnp.float32))
    want = _true_gelu(np.asarray(x.astype(jnp.float32)).astype(np.float64))
    assert np.all(np.abs(a - want) <= 2 ** -7 * np.abs(want) + 1e-4)


def test_gelu_value_accuracy():
    x = _xs()
    got = np.asarray(gelu_erf(jnp.asarray(x)))
    want = x.astype(np.float64) * 0.5 * (
        1.0 + scipy_erf(x.astype(np.float64) / np.sqrt(2.0))
    )
    # abs err bounded by |x|·7.5e-8; relative to float32 noise
    assert np.max(np.abs(got - want) / (1.0 + np.abs(want))) <= 2e-6


def test_gelu_grad_matches_xla_erf():
    x = jnp.asarray(np.linspace(-6, 6, 1001, dtype=np.float32))
    g_fast = jax.vmap(jax.grad(gelu_erf))(x)
    g_ref = jax.vmap(jax.grad(lambda v: jax.nn.gelu(v, approximate=False)))(x)
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_ref), atol=4e-6
    )


def test_gelu_bf16_equivalence():
    """A&S gelu on bf16 inputs is within ~1 bf16 ulp of the true gelu."""
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4096,)).astype(np.float32) * 3
    ).astype(jnp.bfloat16)
    a = np.asarray(gelu_erf(x).astype(jnp.float32))
    want = _true_gelu(np.asarray(x.astype(jnp.float32)).astype(np.float64))
    assert np.all(np.abs(a - want) <= 2 ** -7 * np.abs(want) + 1e-5)


def test_mlp_uses_fast_gelu_and_matches_exact():
    from msvit_tpu.models.base import BaseViTConfig
    from msvit_tpu.models.base.model import BaseMLP
    from msvit_tpu.settings import parity_policy

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    fast_cfg = BaseViTConfig(
        hidden_size=32, num_attention_heads=4, policy=parity_policy()
    )
    exact_cfg = BaseViTConfig(
        hidden_size=32,
        num_attention_heads=4,
        hidden_act="gelu_xla_erf",
        policy=parity_policy(),
    )
    v = BaseMLP(fast_cfg).init(jax.random.PRNGKey(1), x)
    a = BaseMLP(fast_cfg).apply(v, x)
    b = BaseMLP(exact_cfg).apply(v, x)
    # "gelu" default is the tanh-form (erf err <=4.3e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    as_cfg = BaseViTConfig(
        hidden_size=32,
        num_attention_heads=4,
        hidden_act="gelu_as",
        policy=parity_policy(),
    )
    c = BaseMLP(as_cfg).apply(v, x)
    np.testing.assert_allclose(np.asarray(c), np.asarray(b), atol=1e-5)
