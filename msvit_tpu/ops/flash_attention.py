"""Fused masked flash attention (Pallas, TPU) — forward AND backward.

TPU-native replacement for the reference's `F.scaled_dot_product_attention`
path (`model/base_encoder/modeling_base.py:144-152` and the multistate SDPA
variant `modeling_msvitencoder.py:235-243`): never materializes the
[B, H, Nq, Nk] scores/probs matrix in HBM.  Online-softmax tiling with

* grid (batch, head, q_blocks, kv_blocks), kv innermost; f32 running
  max / sum / accumulator in VMEM scratch that persists across kv tiles;
* arbitrary boolean masks (True = attend) or additive float masks (the
  multistate soft penalty), broadcast over heads or per-head, loaded
  tile-by-tile — this covers every mask the encoder zoo builds (cluster
  block masks, context-length masks, validity masks);
* kv-length padding handled inside the kernel via column iota, so callers
  may pass any sequence length;
* large blocks (512×1024 by default, v5e-swept — the round-1 kernel's 128×128 tiles
  underutilized the MXU and lost to XLA at its own target shapes).

Backward: dedicated Pallas dQ and dK/dV kernels (standard flash-attention
backward: recompute the probability tile from q·kᵀ and the saved
logsumexp, never touching HBM with O(N²) terms).  The forward saves
``lse = m + log l`` lane-replicated as [B, H, Nq_pad, 128] (the same
layout jax's reference TPU kernel uses); ``δ = rowsum(dO ⊙ O)`` is
recomputed per tile inside the kernels from the saved output, so no
[B,H,N] side arrays are materialized either.  These backward kernels are
shared by `ops/fused_attention.py` (whose single-pass forward also emits
an lse), replacing the round-1 XLA recompute that re-materialized the
probs in HBM during training.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msvit_tpu.ops.attention import DEFAULT_MASK_VALUE

_LANES = 128
# default tile sizes (v5e sweep, benchmarks/bench_flash.py: 5.65 ms at [16,12,1600,64] vs 9.5 XLA)
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_axis(x: jnp.ndarray, axis: int, to: int) -> jnp.ndarray:
    pad = to - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _block_sizes(nq: int, nk: int, block_q: int, block_k: int):
    bq = min(block_q, _cdiv(nq, _LANES) * _LANES)
    bk = min(block_k, _cdiv(nk, _LANES) * _LANES)
    return bq, bk, _cdiv(nq, bq) * bq, _cdiv(nk, bk) * bk


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _prep_mask(mask, b, h, nq, nk, nq_pad, nk_pad):
    """Broadcast a bool (True = attend) or additive-float mask to
    [B, Hm, Nq, Nk] and pad (False / 0.0 — padded columns are killed by
    the kv-length iota anyway); returns (padded mask, per-head index
    component fn)."""
    if mask.dtype != jnp.bool_:
        mask = mask.astype(jnp.float32)
    if mask.ndim != 4:
        raise ValueError(f"mask must be 4D, got {mask.shape}")
    hm = mask.shape[1]
    mb = jnp.broadcast_to(mask, (b, hm, nq, nk))
    mb = _pad_axis(_pad_axis(mb, 2, nq_pad), 3, nk_pad)
    return mb, (lambda h_: h_) if hm == h else (lambda h_: 0)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref,
    k_ref,
    v_ref,
    mask_ref,
    o_ref,
    lse_ref,
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
    bq, bk = q.shape[0], k.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    s = s * scale

    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + kv_idx * bk
    valid = col < kv_len
    if mask_ref is not None:
        m_tile = mask_ref[0, 0]
        if m_tile.dtype == jnp.bool_:
            valid = jnp.logical_and(valid, m_tile)
        else:
            # additive float mask (the multistate soft penalty,
            # reference `modeling_msvitencoder.py:146`)
            s = s + m_tile
    s = jnp.where(valid, s, mask_value)

    m_prev = m_scratch[...]  # [bq, LANES] (lane-replicated)
    l_prev = l_scratch[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
    m_next = jnp.maximum(m_prev, m_curr)  # [bq, LANES]
    alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])  # [bq, 1]
    p = jnp.exp(s - m_next[:, :1])  # [bq, bk]
    l_scratch[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scratch[...] = m_next

    v = v_ref[0, 0]  # [bk, dh]
    acc_scratch[...] = acc_scratch[...] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l_final = l_scratch[...][:, :1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
        if lse_ref is not None:
            l_all = l_scratch[...]
            lse_ref[0, 0] = jnp.where(
                l_all > 0.0, m_scratch[...] + jnp.log(l_all), 0.0
            )


@functools.partial(
    jax.jit,
    static_argnames=("scale", "mask_value", "block_q", "block_k", "with_lse"),
)
def _flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: float,
    mask_value: float,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    with_lse: bool = False,
):
    """Returns out [B,H,Nq,Dh] (sliced) and, when with_lse, the padded
    lane-replicated lse [B,H,Nq_pad,128] (f32)."""
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    bq, bk, nq_pad, nk_pad = _block_sizes(nq, nk, block_q, block_k)

    qp = _pad_axis(q, 2, nq_pad)
    kp = _pad_axis(k, 2, nk_pad)
    vp = _pad_axis(v, 2, nk_pad)

    num_q_blocks = nq_pad // bq
    num_kv_blocks = nk_pad // bk
    grid = (b, h, num_q_blocks, num_kv_blocks)

    in_specs = [
        pl.BlockSpec((1, 1, bq, dh), lambda b_, h_, qi, ki: (b_, h_, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, dh), lambda b_, h_, qi, ki: (b_, h_, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, dh), lambda b_, h_, qi, ki: (b_, h_, ki, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qp, kp, vp]

    if mask is not None:
        mb, hmap = _prep_mask(mask, b, h, nq, nk, nq_pad, nk_pad)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, bq, bk),
                lambda b_, h_, qi, ki: (b_, hmap(h_), qi, ki),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(mb)

    out_shapes = [jax.ShapeDtypeStruct((b, h, nq_pad, dh), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, 1, bq, dh), lambda b_, h_, qi, ki: (b_, h_, qi, 0),
                     memory_space=pltpu.VMEM)
    ]
    if with_lse:
        out_shapes.append(
            jax.ShapeDtypeStruct((b, h, nq_pad, _LANES), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, 1, bq, _LANES), lambda b_, h_, qi, ki: (b_, h_, qi, 0),
                memory_space=pltpu.VMEM,
            )
        )

    static = dict(
        scale=scale, kv_len=nk, mask_value=mask_value,
        num_kv_blocks=num_kv_blocks,
    )

    def kernel(*refs):
        n_in = 3 + (1 if mask is not None else 0)
        ins, outs, scratch = refs[:n_in], refs[n_in:-3], refs[-3:]
        qr, kr, vr = ins[:3]
        mr = ins[3] if mask is not None else None
        lr = outs[1] if with_lse else None
        _fwd_kernel(qr, kr, vr, mr, outs[0], lr, *scratch, **static)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq_pad * nk_pad * dh,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * nq_pad * nk_pad,
        ),
        # interpreter mode off-TPU: lets CPU CI exercise the kernel math
        interpret=_interpret(),
    )(*operands)
    out = outs[0][:, :, :nq]
    return (out, outs[1]) if with_lse else (out, None)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _recompute_p_ds(q, k, v, do, o, lse, mask_tile, kv_base, kv_len,
                    scale, mask_value):
    """Shared tile math for both backward kernels: rebuild the probability
    tile from (q, k, lse) and form dS = P ⊙ (dO·Vᵀ − δ)."""
    bq, bk = q.shape[0], k.shape[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + kv_base
    valid = col < kv_len
    if mask_tile is not None:
        if mask_tile.dtype == jnp.bool_:
            valid = jnp.logical_and(valid, mask_tile)
        else:
            # additive float mask (same order as the fused forward:
            # scaled scores + mask, then the kv-length cut)
            s = s + mask_tile
    s = jnp.where(valid, s, mask_value)
    p = jnp.exp(s - lse[:, :1])  # [bq, bk]; masked entries underflow to 0
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=1, keepdims=True
    )  # [bq, 1]
    ds = p * (dp - delta)  # [bq, bk] f32
    return p, ds


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, mask_ref, dq_ref, dq_scratch,
    *, scale, kv_len, mask_value, num_kv_blocks,
):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scratch[...] = jnp.zeros(dq_scratch.shape, jnp.float32)

    k = k_ref[0, 0]
    mask_tile = mask_ref[0, 0] if mask_ref is not None else None
    _, ds = _recompute_p_ds(
        q_ref[0, 0], k, v_ref[0, 0], do_ref[0, 0], o_ref[0, 0],
        lse_ref[0, 0], mask_tile, kv_idx * k.shape[0], kv_len, scale,
        mask_value,
    )
    dq_scratch[...] += jax.lax.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32
    ) * scale

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        dq_ref[0, 0] = dq_scratch[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, mask_ref, dk_ref, dv_ref,
    dk_scratch, dv_scratch,
    *, scale, kv_len, mask_value, num_q_blocks,
):
    q_idx = pl.program_id(3)
    kv_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scratch[...] = jnp.zeros(dk_scratch.shape, jnp.float32)
        dv_scratch[...] = jnp.zeros(dv_scratch.shape, jnp.float32)

    q = q_ref[0, 0]
    do = do_ref[0, 0]
    mask_tile = mask_ref[0, 0] if mask_ref is not None else None
    p, ds = _recompute_p_ds(
        q, k_ref[0, 0], v_ref[0, 0], do, o_ref[0, 0], lse_ref[0, 0],
        mask_tile, kv_idx * k_ref.shape[2], kv_len, scale, mask_value,
    )
    # dV += Pᵀ · dO ; dK += dSᵀ · Q  (contract over the q rows)
    dv_scratch[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_scratch[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(q_idx == num_q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "mask_value", "block_q", "block_k")
)
def flash_attention_bwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    out: jnp.ndarray,  # saved forward output [B,H,Nq,Dh]
    g: jnp.ndarray,  # cotangent of out
    lse: jnp.ndarray,  # [B,H,Nq] f32 (compact) or [B,H,Nq_pad,128]
    mask: Optional[jnp.ndarray],
    scale: float,
    mask_value: float,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pallas flash backward (dq, dk, dv).  Also used by the single-pass
    fused kernel (`ops/fused_attention.py`), whose forward emits the same
    lse layout.

    `lse` is normally the COMPACT [B,H,Nq] residual (the lane-replicated
    kernel layout is rebuilt here transiently — storing it across the
    fwd/bwd gap costs 128× the HBM); a raw lane-replicated kernel output
    is also accepted."""
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    bq, bk, nq_pad, nk_pad = _block_sizes(nq, nk, block_q, block_k)
    # lse = 0 on padded rows is safe: padded q rows are zero, so
    # p = exp(0 − 0) ≤ 1 and their dO is zero.
    if lse.ndim == 4:  # raw kernel output [B,H,Nq_pad,128]
        lse = lse[:, :, :, 0]
    lse = _pad_axis(lse[:, :, :nq], 2, nq_pad)
    lse = jnp.broadcast_to(lse[..., None], (b, h, nq_pad, _LANES))

    qp = _pad_axis(q, 2, nq_pad)
    kp = _pad_axis(k, 2, nk_pad)
    vp = _pad_axis(v, 2, nk_pad)
    op = _pad_axis(out, 2, nq_pad)
    gp = _pad_axis(g.astype(q.dtype), 2, nq_pad)

    num_q_blocks = nq_pad // bq
    num_kv_blocks = nk_pad // bk

    mb = hmap = None
    if mask is not None:
        mb, hmap = _prep_mask(mask, b, h, nq, nk, nq_pad, nk_pad)

    def specs(index_map_by):
        """q-major ('dq') or kv-major ('dkv') input specs."""
        if index_map_by == "dq":
            qmap = lambda b_, h_, qi, ki: (b_, h_, qi, 0)  # noqa: E731
            kmap = lambda b_, h_, qi, ki: (b_, h_, ki, 0)  # noqa: E731
            mmap = lambda b_, h_, qi, ki: (b_, hmap(h_), qi, ki)  # noqa: E731
        else:  # grid (b, h, kv, q)
            qmap = lambda b_, h_, ki, qi: (b_, h_, qi, 0)  # noqa: E731
            kmap = lambda b_, h_, ki, qi: (b_, h_, ki, 0)  # noqa: E731
            mmap = lambda b_, h_, ki, qi: (b_, hmap(h_), qi, ki)  # noqa: E731
        sp = [
            pl.BlockSpec((1, 1, bq, dh), qmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dh), kmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dh), kmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, dh), qmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, dh), qmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, _LANES), qmap, memory_space=pltpu.VMEM),
        ]
        if mask is not None:
            sp.append(
                pl.BlockSpec((1, 1, bq, bk), mmap, memory_space=pltpu.VMEM)
            )
        return sp

    operands = [qp, kp, vp, gp, op, lse] + ([mb] if mask is not None else [])
    common = dict(scale=scale, kv_len=nk, mask_value=mask_value)

    def wrap(kern, n_out, **static):
        def kernel(*refs):
            n_in = 6 + (1 if mask is not None else 0)
            ins = list(refs[:6]) + [refs[6] if mask is not None else None]
            outs = refs[n_in : n_in + n_out]
            scratch = refs[n_in + n_out :]
            kern(*ins, *outs, *scratch, **common, **static)

        return kernel

    dq = pl.pallas_call(
        wrap(_bwd_dq_kernel, 1, num_kv_blocks=num_kv_blocks),
        grid=(b, h, num_q_blocks, num_kv_blocks),
        in_specs=specs("dq"),
        out_specs=pl.BlockSpec(
            (1, 1, bq, dh), lambda b_, h_, qi, ki: (b_, h_, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, nq_pad, dh), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * nq_pad * nk_pad * dh,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * nq_pad * nk_pad,
        ),
        interpret=_interpret(),
    )(*operands)

    dk, dv = pl.pallas_call(
        wrap(_bwd_dkv_kernel, 2, num_q_blocks=num_q_blocks),
        grid=(b, h, num_kv_blocks, num_q_blocks),
        in_specs=specs("dkv"),
        out_specs=[
            pl.BlockSpec(
                (1, 1, bk, dh), lambda b_, h_, ki, qi: (b_, h_, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bk, dh), lambda b_, h_, ki, qi: (b_, h_, ki, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nk_pad, dh), k.dtype),
            jax.ShapeDtypeStruct((b, h, nk_pad, dh), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, dh), jnp.float32),
            pltpu.VMEM((bk, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * nq_pad * nk_pad * dh,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * nq_pad * nk_pad,
        ),
        interpret=_interpret(),
    )(*operands)

    return dq[:, :, :nq], dk[:, :, :nk], dv[:, :, :nk]


# ---------------------------------------------------------------------------
# custom-vjp wiring + public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, mask, scale, mask_value):
    out, _ = _flash_forward(q, k, v, mask, scale=scale, mask_value=mask_value)
    return out


def _flash_fwd(q, k, v, mask, scale, mask_value):
    out, lse = _flash_forward(
        q, k, v, mask, scale=scale, mask_value=mask_value, with_lse=True
    )
    # save the residual COMPACT ([B,H,Nq] — one lane): the kernel's
    # lane-replicated [B,H,Nq_pad,128] f32 would cost 128× the HBM
    # (402 MB/layer at ViT-B bs256 — OOMs a 12-layer no-remat train
    # step); the backward re-broadcasts transiently.
    nq = q.shape[2]
    return out, (q, k, v, mask, out, lse[:, :, :nq, 0])


def _flash_bwd(scale, mask_value, residuals, g):
    q, k, v, mask, out, lse = residuals
    dq, dk, dv = flash_attention_bwd(
        q, k, v, out, g, lse, mask, scale=scale, mask_value=mask_value
    )
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
