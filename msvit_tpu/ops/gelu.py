"""Fast erf-exact GELU for TPU.

`jax.nn.gelu(approximate=False)` lowers erf to XLA's high-degree
polynomial, which runs at ~68 G elem/s on v5e — 10× slower than the
hardware-accelerated tanh/exp transcendentals (677/270 G elem/s,
benchmarks/RESULTS.md) and worth 54 ms/batch on the ViT-B bf16 path.
This module computes the SAME function through the Abramowitz–Stegun
7.1.26 rational approximation, whose only transcendental is one hardware
`exp`:

    erf(x) = 1 − (a₁t + a₂t² + a₃t³ + a₄t⁴ + a₅t⁵)·e^(−x²),  t = 1/(1+px)

Max abs error 1.5e-7 in erf ⇒ ≤ ~1e-7 absolute in gelu — far inside the
1e-3 torch-parity bar (tests/test_base_parity.py) and below bf16
resolution (2^-8 relative), so outputs are bit-identical after the bf16
cast for all but a measure-zero set of inputs.  Reference semantics:
`modeling_base.py` MLP act (HF ViT default "gelu" = erf-exact).

A custom JVP evaluates the exact derivative Φ(x) + x·φ(x) with one more
hardware exp — the backward never touches XLA's erf either.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_P = 0.3275911
_A1 = 0.254829592
_A2 = -0.284496736
_A3 = 1.421413741
_A4 = -1.453152027
_A5 = 1.061405429
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf_pos(x32: jnp.ndarray) -> jnp.ndarray:
    """A&S 7.1.26 for x ≥ 0 (f32 in/out)."""
    t = 1.0 / (1.0 + _P * x32)
    poly = t * (_A1 + t * (_A2 + t * (_A3 + t * (_A4 + t * _A5))))
    return 1.0 - poly * jnp.exp(-(x32 * x32))


def erf(x: jnp.ndarray) -> jnp.ndarray:
    """erf via A&S 7.1.26 (abs err ≤ 1.5e-7), computed in f32."""
    x32 = x.astype(jnp.float32)
    return (jnp.sign(x32) * _erf_pos(jnp.abs(x32))).astype(x.dtype)


@jax.custom_jvp
def gelu_erf(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-erf GELU: x · Φ(x), Φ(x) = ½(1 + erf(x/√2))."""
    x32 = x.astype(jnp.float32)
    u = x32 * _INV_SQRT2
    e = jnp.sign(u) * _erf_pos(jnp.abs(u))
    return (0.5 * x32 * (1.0 + e)).astype(x.dtype)


@gelu_erf.defjvp
def _gelu_erf_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    x32 = x.astype(jnp.float32)
    u = x32 * _INV_SQRT2
    e = jnp.sign(u) * _erf_pos(jnp.abs(u))
    phi_cdf = 0.5 * (1.0 + e)
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * x32 * x32)
    y = (x32 * phi_cdf).astype(x.dtype)
    dy = ((phi_cdf + x32 * pdf) * dx.astype(jnp.float32)).astype(x.dtype)
    return y, dy


# tanh-form erf: erf(u) ≈ tanh(u·(a + u²·(b + u²·c))).  Coefficients
# minimax-fitted over u ∈ [0, 8] (Nelder-Mead, benchmarks session r3);
# max abs err 4.3e-5 — 40× tighter than the standard tanh-GELU's ~1e-3
# Φ error, below bf16 output resolution, and its only transcendental is
# the HARDWARE tanh (no exp, no abs/sign: the odd polynomial handles
# negative u natively).  Grad comes from autodiff (sech² = 1 − tanh²,
# also exp-free).
_T_A = 1.12822551
_T_B = 0.10392653
_T_C = -0.00173499


def erf_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """erf via the fitted tanh form (abs err ≤ 4.3e-5), f32 math.

    The fit holds on |u| ≤ 8 and the odd polynomial's negative leading
    coefficient flips sign far outside it, so u is clamped to ±6 first
    (erf(6) = 1 − 2e-17: the clamp is exact)."""
    u = jnp.clip(x.astype(jnp.float32), -6.0, 6.0)
    u2 = u * u
    return jnp.tanh(u * (_T_A + u2 * (_T_B + u2 * _T_C))).astype(x.dtype)


def gelu_erf_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """GELU with the tanh-form erf: erf-grade accuracy (≤ ~2e-5·|x| abs
    err, identical to exact GELU after a bf16 cast) at tanh-GELU speed."""
    x32 = x.astype(jnp.float32)
    u = jnp.clip(x32 * _INV_SQRT2, -6.0, 6.0)
    u2 = u * u
    e = jnp.tanh(u * (_T_A + u2 * (_T_B + u2 * _T_C)))
    return (0.5 * x32 * (1.0 + e)).astype(x.dtype)
