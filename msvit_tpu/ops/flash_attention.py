"""Fused masked flash attention (Pallas, TPU).

TPU-native replacement for the reference's `F.scaled_dot_product_attention`
path (`model/base_encoder/modeling_base.py:144-152` and the multistate SDPA
variant `modeling_msvitencoder.py:235-243`): never materializes the
[B, H, Nq, Nk] scores/probs matrix in HBM.  Online-softmax tiling with

* grid (batch, head, q_blocks, kv_blocks), kv innermost; f32 running
  max / sum / accumulator in VMEM scratch that persists across kv tiles;
* arbitrary **boolean** masks (True = attend), broadcast over heads or
  per-head, loaded tile-by-tile — this covers every mask the encoder zoo
  builds (cluster block masks, context-length masks, validity masks);
* kv-length padding handled inside the kernel via column iota, so callers
  may pass any sequence length.

Backward: `custom_vjp` whose backward recomputes attention with the XLA
path and differentiates it.  At this framework's sequence lengths
(≤ ~2k tokens: 784 patches + cluster tokens — SURVEY §5) the recompute is
cheap and the O(N²) probs fit comfortably; dedicated dKV/dQ Pallas kernels
are a later optimization.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msvit_tpu.ops.attention import DEFAULT_MASK_VALUE, xla_attention

_LANES = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _fwd_kernel(
    q_ref,
    k_ref,
    v_ref,
    mask_ref,
    o_ref,
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    scale: float,
    kv_len: int,
    mask_value: float,
    num_kv_blocks: int,
):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    q = q_ref[0, 0]  # [bq, dh]
    k = k_ref[0, 0]  # [bk, dh]
    bq = q.shape[0]
    bk = k.shape[0]

    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, bk]
    s = s * scale

    # kv padding + user mask
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + kv_idx * bk
    valid = col < kv_len
    if mask_ref is not None:
        valid = jnp.logical_and(valid, mask_ref[0, 0])
    s = jnp.where(valid, s, mask_value)

    m_prev = m_scratch[...]  # [bq, LANES] (row-replicated)
    l_prev = l_scratch[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
    m_next = jnp.maximum(m_prev, m_curr)  # broadcast -> [bq, LANES]
    alpha = jnp.exp(m_prev - m_next)  # [bq, LANES]
    p = jnp.exp(s - m_next[:, :1])  # [bq, bk]
    l_scratch[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scratch[...] = m_next

    acc_scratch[...] *= alpha[:, :1]
    v = v_ref[0, 0]  # [bk, dh]
    acc_scratch[...] += jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l_final = l_scratch[...][:, :1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def _pad_axis(x: jnp.ndarray, axis: int, to: int) -> jnp.ndarray:
    pad = to - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit, static_argnames=("scale", "mask_value", "block_q", "block_k")
)
def _flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: float,
    mask_value: float,
    block_q: int,
    block_k: int,
) -> jnp.ndarray:
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    bq = min(block_q, max(_LANES, 1 << (nq - 1).bit_length()))
    bk = min(block_k, max(_LANES, 1 << (nk - 1).bit_length()))
    nq_pad = _cdiv(nq, bq) * bq
    nk_pad = _cdiv(nk, bk) * bk

    qp = _pad_axis(q, 2, nq_pad)
    kp = _pad_axis(k, 2, nk_pad)
    vp = _pad_axis(v, 2, nk_pad)

    num_q_blocks = nq_pad // bq
    num_kv_blocks = nk_pad // bk
    grid = (b, h, num_q_blocks, num_kv_blocks)

    in_specs = [
        pl.BlockSpec(
            (1, 1, bq, dh), lambda b_, h_, qi, ki: (b_, h_, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, bk, dh), lambda b_, h_, qi, ki: (b_, h_, ki, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, bk, dh), lambda b_, h_, qi, ki: (b_, h_, ki, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [qp, kp, vp]

    if mask is not None:
        mask = mask.astype(jnp.bool_)
        # broadcast to [B, Hm, Nq, Nk] then pad; padded area False
        if mask.ndim != 4:
            raise ValueError(f"mask must be 4D, got {mask.shape}")
        hm = mask.shape[1]
        mb = jnp.broadcast_to(mask, (b, hm, nq, nk))
        mb = _pad_axis(_pad_axis(mb, 2, nq_pad), 3, nk_pad)
        head_map = (lambda b_, h_, qi, ki: (b_, h_, qi, ki)) if hm == h else (
            lambda b_, h_, qi, ki: (b_, 0, qi, ki)
        )
        in_specs.append(
            pl.BlockSpec((1, 1, bq, bk), head_map, memory_space=pltpu.VMEM)
        )
        operands.append(mb)

    static = dict(
        scale=scale, kv_len=nk, mask_value=mask_value, num_kv_blocks=num_kv_blocks
    )
    if mask is not None:
        kernel = functools.partial(_fwd_kernel, **static)
    else:

        def kernel(qr, kr, vr, o, m, l, a):
            _fwd_kernel(qr, kr, vr, None, o, m, l, a, **static)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, bq, dh), lambda b_, h_, qi, ki: (b_, h_, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, nq_pad, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, dh), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq_pad * nk_pad * dh,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * nq_pad * nk_pad,
        ),
        # interpreter mode off-TPU: lets CPU CI exercise the kernel math
        interpret=jax.devices()[0].platform != "tpu",
    )(*operands)
    return out[:, :, :nq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, mask, scale, mask_value):
    return _flash_forward(
        q, k, v, mask, scale=scale, mask_value=mask_value, block_q=128, block_k=128
    )


def _flash_fwd(q, k, v, mask, scale, mask_value):
    return _flash(q, k, v, mask, scale, mask_value), (q, k, v, mask)


def _flash_bwd(scale, mask_value, residuals, g):
    q, k, v, mask = residuals

    def ref(q_, k_, v_):
        out, _ = xla_attention(
            q_, k_, v_, mask=mask, scale=scale, mask_value=mask_value
        )
        return out

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    mask_value: float = DEFAULT_MASK_VALUE,
) -> jnp.ndarray:
    """Fused attention. q [B,H,Nq,Dh]; k,v [B,H,Nk,Dh]; bool mask
    broadcastable to [B,H,Nq,Nk] (True = attend)."""
    if scale is None:
        scale = 1.0 / q.shape[-1] ** 0.5
    return _flash(q, k, v, mask, float(scale), float(mask_value))
