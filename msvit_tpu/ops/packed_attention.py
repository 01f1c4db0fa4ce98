"""Packed-layout fused attention (Pallas, TPU).

Multi-head attention that consumes the QKV projection output in its
natural GEMM layout ``[B, N, 3*D]`` and emits ``[B, N, D]`` ready for the
output projection — the layout the reference's SDPA path destroys with
``[3,B,H,N,dh]`` transposes (`modeling_base.py:60-66`).

Why this shape: on v5e the conventional ``[B,H,N,64]`` attention operands
have a 64-element minor dim, which cripples HBM DMA (~150 GB/s effective,
measured: a pure-copy Pallas kernel over those operands costs 4.6 ms at
ViT-B/224 bs512 — the whole kernel budget).  Fat contiguous ``[N, 3D]``
rows restore full bandwidth, the two HBM transposes disappear, and the
[B,H,N,N] scores never leave VMEM.  Heads are split by lane-slicing
inside the kernel.  Measured 3.7 ms/layer vs 8.3 ms for the XLA path at
[512, 197, 2304] (benchmarks/RESULTS.md).

Semantics match `ops.attention.xla_attention` restricted to self-attention
(Nk == Nq): bool masks mean "True = may attend", float masks are additive
(reference `modeling_base.py:89-93`).  Softmax statistics in f32.

Backward: the forward emits a per-head logsumexp residual and the
shared Pallas dQ/dKV kernels (ops/flash_attention.py) rebuild
probability tiles from it — O(N²) never hits HBM in training either.
(The int8 variant is inference-only.)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msvit_tpu.ops.attention import DEFAULT_MASK_VALUE, xla_attention


def _kernel_masked(qkv_ref, mask_ref, o_ref, lse_ref, *, num_heads, scale,
                   mask_value):
    tb = qkv_ref.shape[0]
    d3 = qkv_ref.shape[-1]
    d = d3 // 3
    dh = d // num_heads
    for e in range(tb):
        x = qkv_ref[e]  # [N, 3D]
        outs = []
        for h in range(num_heads):
            q = x[:, h * dh : (h + 1) * dh]
            k = x[:, d + h * dh : d + (h + 1) * dh]
            v = x[:, 2 * d + h * dh : 2 * d + (h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if scale != 1.0:  # trace-time: pre-scaled q skips a VPU pass
                s = s * scale
            if mask_ref is not None:
                hm = mask_ref.shape[1]
                m = mask_ref[e, h if hm > 1 else 0]
                if m.dtype == jnp.bool_:
                    s = jnp.where(m, s, mask_value)
                else:
                    s = s + m.astype(jnp.float32)
            if lse_ref is None:
                # Inference: shaved softmax (r3 sweep, proto_packed_bf16_r3
                # — 0.64 ms/layer off the f32 VPU chain over the scores).
                # Softmax is shift-invariant, so the row max is only
                # overflow protection: clamp to ±80 instead (197·e^80 =
                # 1.1e37 < f32 max; post-LN scores are |s| ≪ 80, and a
                # fully-masked row degrades to mean(v), exactly like XLA
                # softmax of an all −1e9 row) — removes the max pass and
                # the subtract.  exp writes the compute dtype directly and
                # the row sum rides the MXU as a ones column appended to v
                # — removes the sum and cast passes.  l ≥ N·e⁻⁸⁰ > 0, no
                # zero guard needed.
                pb = jnp.exp(jnp.clip(s, -80.0, 80.0)).astype(x.dtype)
                ones = jnp.ones((pb.shape[1], 1), x.dtype)
                v1 = jnp.concatenate([v, ones], axis=1)  # [N, dh+1]
                o1 = jax.lax.dot_general(
                    pb, v1, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                outs.append((o1[:, :dh] / o1[:, dh : dh + 1]).astype(
                    o_ref.dtype
                ))
                continue
            # Training forward: max-SUBTRACTED softmax with a true lse.
            # The r3 no-max shave (exp(clip(s, ±80))) is an inference
            # optimization that is UNSAFE here: once attention logits
            # grow past the clamp mid-training (they do, without
            # qk-norm — observed at step ~700 of the r4 synthetic s8
            # run), p·v overflows (N·e⁸⁰·|v| > f32 max) and the clipped
            # lse makes the backward's exp(s − lse) explode.  The row
            # max costs one VPU reduce only on the training path; the
            # saved lse = m + log Σ exp(s−m) is exact, which keeps the
            # backward exp(s − lse) ≤ 1 at ANY logit scale.
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)  # ≥ 1 (the max entry)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # defer the 1/l normalization to the [N, dh] output (3x fewer
            # divisions than normalizing the [N, N] probs)
            outs.append((o / l).astype(o_ref.dtype))
            lse_ref[e, h] = m + jnp.log(l)
        o_ref[e] = jnp.concatenate(outs, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "mask_value", "block_b",
                     "with_lse"),
)
def _packed_forward(qkv, mask, num_heads, scale, mask_value, block_b=1,
                    with_lse=False):
    b, n, d3 = qkv.shape
    d = d3 // 3
    while b % block_b:
        block_b //= 2
    operands = [qkv]
    in_specs = [
        pl.BlockSpec((block_b, n, d3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    has_mask = mask is not None
    if has_mask:
        hm = mask.shape[1]
        mdtype = jnp.bool_ if mask.dtype == jnp.bool_ else jnp.float32
        mb = jnp.broadcast_to(mask.astype(mdtype), (b, hm, n, n))
        in_specs.append(
            pl.BlockSpec((block_b, hm, n, n), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(mb)

    def kernel(*refs):
        qr = refs[0]
        mr = refs[1] if has_mask else None
        n_in = 2 if has_mask else 1
        o_r = refs[n_in]
        l_r = refs[n_in + 1] if with_lse else None
        _kernel_masked(qr, mr, o_r, l_r, num_heads=num_heads, scale=scale,
                       mask_value=mask_value)

    out_shapes = [jax.ShapeDtypeStruct((b, n, d), qkv.dtype)]
    out_specs = [
        pl.BlockSpec((block_b, n, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    if with_lse:
        # per-head logsumexp [B, H, N, 1] f32 (minor dim 1: tiny tensor,
        # lane padding is irrelevant) — the flash backward residual
        out_shapes.append(
            jax.ShapeDtypeStruct((b, num_heads, n, 1), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((block_b, num_heads, n, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    outs = pl.pallas_call(
        kernel,
        grid=(b // block_b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * n * n * (d // num_heads),
            bytes_accessed=qkv.size * 2 + b * n * d * 2,
            transcendentals=b * num_heads * n * n,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(*operands)
    if with_lse:
        return outs[0], outs[1][..., 0]  # out, lse [B,H,N]
    return outs[0] if isinstance(outs, (list, tuple)) else outs


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "mask_value", "head_group",
                     "with_lse"),
)
def _packed_forward_grouped(qkv, mask, num_heads, scale, mask_value,
                            head_group=2, with_lse=False):
    """Head-grouped packed forward for the mid-length regime (~512-1024
    tokens): grid (B, H/hg), each program holding only `head_group`
    heads' [N,N] scores in VMEM (the all-heads kernel stacks H of them —
    44.9 MB at 816 tokens).  `head_group * dh` must be a lane multiple
    (128), so hg=2 for dh=64.  The qkv operand is viewed [B, N, 3, D] so
    a program's q|k|v columns are one contiguous lane block."""
    b, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    hg = head_group
    gw = hg * dh  # lane width per program
    qkv4 = qkv.reshape(b, n, 3, d)
    operands = [qkv4]
    in_specs = [
        pl.BlockSpec((1, n, 3, gw), lambda i, g: (i, 0, 0, g),
                     memory_space=pltpu.VMEM)
    ]
    has_mask = mask is not None
    if has_mask:
        hm = mask.shape[1]
        mdtype = jnp.bool_ if mask.dtype == jnp.bool_ else jnp.float32
        mb = jnp.broadcast_to(mask.astype(mdtype), (b, hm, n, n))
        if hm == 1:
            mspec = pl.BlockSpec((1, 1, n, n), lambda i, g: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        else:
            mspec = pl.BlockSpec((1, hg, n, n), lambda i, g: (i, g, 0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs.append(mspec)
        operands.append(mb)

    def kernel(*refs):
        qr = refs[0]
        mr = refs[1] if has_mask else None
        n_in = 2 if has_mask else 1
        o_r = refs[n_in]
        l_r = refs[n_in + 1] if with_lse else None
        x = qr[0]  # [N, 3, gw]
        outs = []
        for h in range(hg):
            q = x[:, 0, h * dh : (h + 1) * dh]
            k = x[:, 1, h * dh : (h + 1) * dh]
            v = x[:, 2, h * dh : (h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if scale != 1.0:  # trace-time: pre-scaled q skips a VPU pass
                s = s * scale
            if mr is not None:
                m = mr[0, h if mr.shape[1] > 1 else 0]
                if m.dtype == jnp.bool_:
                    s = jnp.where(m, s, mask_value)
                else:
                    s = s + m.astype(jnp.float32)
            if l_r is None:
                # shaved inference softmax — see _kernel_masked.  The row
                # sum uses a separate pb@ones dot here: concatenating a
                # fresh ones column onto the lane-offset v slice dies in
                # Mosaic at grouped shapes ("result/input offset mismatch
                # on non-concat dimension", chip-verified at N=816).
                pb = jnp.exp(jnp.clip(s, -80.0, 80.0)).astype(x.dtype)
                ones = jnp.ones((pb.shape[1], 1), x.dtype)
                l = jax.lax.dot_general(
                    pb, ones, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o = jax.lax.dot_general(
                    pb, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                outs.append((o / l).astype(o_r.dtype))
                continue
            # max-subtracted training forward — see _kernel_masked (the
            # no-max shave overflows once logits pass the clamp; r4 fix)
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append((o / l).astype(o_r.dtype))
            l_r[0, h] = mx + jnp.log(l)
        o_r[0] = jnp.concatenate(outs, axis=1)

    out_shapes = [jax.ShapeDtypeStruct((b, n, d), qkv.dtype)]
    out_specs = [
        pl.BlockSpec((1, n, gw), lambda i, g: (i, 0, g),
                     memory_space=pltpu.VMEM)
    ]
    if with_lse:
        out_shapes.append(
            jax.ShapeDtypeStruct((b, num_heads, n, 1), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, hg, n, 1), lambda i, g: (i, g, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    outs = pl.pallas_call(
        kernel,
        grid=(b, num_heads // hg),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * n * n * dh,
            bytes_accessed=qkv.size * 2 + b * n * d * 2,
            transcendentals=b * num_heads * n * n,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(*operands)
    if with_lse:
        return outs[0], outs[1][..., 0]
    return outs[0] if isinstance(outs, (list, tuple)) else outs


def grouped_vmem_ok(
    n: int, d: int, num_heads: int, elem_bytes: int = 2,
    has_mask: bool = False, head_group: int = 2,
    limit: int = 14 * 1024 * 1024,
) -> bool:
    """VMEM fit for the head-grouped packed kernel (hg heads' scores +
    one lane-group of qkv/out, double-buffered)."""
    if (head_group * (d // num_heads)) % 128:
        return False
    if num_heads % head_group:
        return False

    def pad(x, m):
        return -(-x // m) * m

    scores = head_group * pad(n, 8) * pad(n, 128) * 4
    gw = head_group * (d // num_heads)
    io = 2 * (n * 3 * gw + n * gw) * elem_bytes
    m_bytes = 2 * pad(n, 8) * pad(n, 128) * 4 if has_mask else 0
    return scores + io + m_bytes <= limit


def _dispatch_variant(qkv, mask, num_heads) -> str:
    """Pick the packed variant that fits VMEM: 'packed' (all heads),
    'grouped' (2 heads/program), or 'xla' when even the grouped kernel's
    scores exceed the 16MB scope (e.g. direct calls at N > ~1500 —
    without this gate such calls die at Mosaic compile time)."""
    n, d3 = qkv.shape[1], qkv.shape[2]
    d = d3 // 3
    eb = qkv.dtype.itemsize
    has_mask = mask is not None
    if packed_vmem_ok(n, d, num_heads, elem_bytes=eb, has_mask=has_mask):
        return "packed"
    if grouped_vmem_ok(n, d, num_heads, elem_bytes=eb, has_mask=has_mask):
        return "grouped"
    return "xla"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _packed(qkv, mask, num_heads, scale, mask_value):
    variant = _dispatch_variant(qkv, mask, num_heads)
    if variant == "packed":
        return _packed_forward(qkv, mask, num_heads, scale, mask_value)
    if variant == "grouped":
        return _packed_forward_grouped(qkv, mask, num_heads, scale, mask_value)
    return _xla_reference(qkv, mask, num_heads, scale, mask_value)


def _xla_reference(qkv, mask, num_heads, scale, mask_value):
    b, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    t = qkv.reshape(b, n, 3, num_heads, dh).transpose(2, 0, 3, 1, 4)
    out, _ = xla_attention(t[0], t[1], t[2], mask=mask, scale=scale,
                           mask_value=mask_value)
    return jnp.swapaxes(out, 1, 2).reshape(b, n, d)


def _xla_forward_lse(qkv, mask, num_heads, scale, mask_value):
    """Plain-XLA packed forward that also emits the per-head lse residual
    (for the shared `_packed_bwd`); the VMEM-overflow fallback."""
    b, n, d3 = qkv.shape
    d = d3 // 3
    q, k, v = _unpack(qkv, num_heads)
    s = jnp.einsum(
        "bhqe,bhke->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        if mask.dtype == jnp.bool_:
            s = jnp.where(mask, s, mask_value)
        else:
            s = s + mask.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(s, axis=-1)
    p = jnp.exp(s - lse[..., None])
    o = jnp.einsum("bhqk,bhke->bhqe", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    out = jnp.swapaxes(o, 1, 2).reshape(b, n, d).astype(qkv.dtype)
    return out, lse


def _packed_fwd(qkv, mask, num_heads, scale, mask_value):
    variant = _dispatch_variant(qkv, mask, num_heads)
    if variant == "packed":
        out, lse = _packed_forward(
            qkv, mask, num_heads, scale, mask_value, with_lse=True
        )
    elif variant == "grouped":
        out, lse = _packed_forward_grouped(
            qkv, mask, num_heads, scale, mask_value, with_lse=True
        )
    else:
        out, lse = _xla_forward_lse(qkv, mask, num_heads, scale, mask_value)
    return out, (qkv, mask, out, lse)


def _unpack(qkv, num_heads):
    """[B, N, 3D] → q, k, v each [B, H, N, dh]."""
    b, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    t = qkv.reshape(b, n, 3, num_heads, dh).transpose(2, 0, 3, 1, 4)
    return t[0], t[1], t[2]


# Above this [B,H,N,N] f32 transient size the closed-form backward's HBM
# pressure makes XLA spill (bs512 ViT-B train: bwd scaled 2.45× for 2×
# batch — benchmarks/bench_train_r3.py); the flash kernels never
# materialize it.  bs256@197 (477 MB) keeps the measured closed-form win.
_CLOSED_FORM_MAX_BYTES = 768 * 1024 * 1024

# backward dispatch override for benches/tests: "auto" | "kernel" |
# "grouped" | "closed" | "flash"
_BWD_IMPL = "auto"


def _kernel_packed_bwd(qkv_ref, g_ref, o_ref, lse_ref, mask_ref, dqkv_ref,
                       *, num_heads, scale, mask_value):
    """Whole-backward-in-VMEM packed kernel body (one image per program,
    all heads): rebuild p from the saved lse, run the five-matmul
    attention backward per head, emit dqkv already packed [N, 3D].  No
    [B,H,N,N] transient ever reaches HBM and no head-split transposes of
    the operands exist (the flash dQ/dKV path pays 6 padded [B,H,N,64]
    HBM round-trips — 2× tile expansion at dh=64 — plus an f32 lse
    broadcast; see benchmarks/RESULTS.md r3)."""
    tb = qkv_ref.shape[0]
    d3 = qkv_ref.shape[-1]
    d = d3 // 3
    dh = d // num_heads
    f32 = jnp.float32
    for e in range(tb):
        x = qkv_ref[e]  # [N, 3D]
        go = g_ref[e]  # [N, D]
        oo = o_ref[e]
        dqs, dks, dvs = [], [], []
        for h in range(num_heads):
            q = x[:, h * dh : (h + 1) * dh]
            k = x[:, d + h * dh : d + (h + 1) * dh]
            v = x[:, 2 * d + h * dh : 2 * d + (h + 1) * dh]
            gh = go[:, h * dh : (h + 1) * dh]
            oh = oo[:, h * dh : (h + 1) * dh]
            delta = jnp.sum(gh.astype(f32) * oh.astype(f32), axis=-1,
                            keepdims=True)  # [N, 1]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )
            if scale != 1.0:
                s = s * scale
            if mask_ref is not None:
                hm = mask_ref.shape[1]
                m = mask_ref[e, h if hm > 1 else 0]
                if m.dtype == jnp.bool_:
                    s = jnp.where(m, s, mask_value)
                else:
                    s = s + m.astype(f32)
            # exp writes the compute dtype directly (fused cast — one VPU
            # pass instead of exp + cast); ds then reads pb back, which
            # for f32 inputs is exact and for bf16 adds only the same
            # rounding the dv/o dots already see.
            pb = jnp.exp(s - lse_ref[e, h][:, None]).astype(x.dtype)
            dv = jax.lax.dot_general(  # p.T @ gh → [N, dh]
                pb, gh, (((0,), (0,)), ((), ())), preferred_element_type=f32
            )
            dp = jax.lax.dot_general(  # gh @ v.T → [N, N]
                gh, v, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )
            ds = (pb.astype(f32) * (dp - delta)).astype(x.dtype)
            dq = jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())), preferred_element_type=f32
            )
            dk = jax.lax.dot_general(  # ds.T @ q → [N, dh]
                ds, q, (((0,), (0,)), ((), ())), preferred_element_type=f32
            )
            if scale != 1.0:
                dq = dq * scale
                dk = dk * scale
            dqs.append(dq)
            dks.append(dk)
            dvs.append(dv)
        dqkv_ref[e] = jnp.concatenate(
            [c.astype(dqkv_ref.dtype) for c in dqs + dks + dvs], axis=1
        )


def _kernel_packed_bwd_grouped(qkv_ref, g_ref, o_ref, lse_ref, mask_ref,
                               dqkv_ref, dp_scr, *, head_group, dh, scale,
                               mask_value):
    """Head-grouped packed backward body (one image × `head_group` heads
    per program).  The dp panel routes through the `dp_scr` VMEM scratch:
    the write-then-read serializes the per-head dataflow chains (head
    h+1's store must wait for head h's load), so Mosaic keeps only ONE
    head's [N,N] panels live instead of stacking `head_group` independent
    chains — the same buffer-reuse trick cannot be expressed with values
    alone (the python loop builds parallel chains; see packed_vmem_ok)."""
    f32 = jnp.float32
    x = qkv_ref[0]  # [N, 3, gw]
    go = g_ref[0]  # [N, gw]
    oo = o_ref[0]
    dqs, dks, dvs = [], [], []
    for h in range(head_group):
        q = x[:, 0, h * dh : (h + 1) * dh]
        k = x[:, 1, h * dh : (h + 1) * dh]
        v = x[:, 2, h * dh : (h + 1) * dh]
        gh = go[:, h * dh : (h + 1) * dh]
        oh = oo[:, h * dh : (h + 1) * dh]
        delta = jnp.sum(gh.astype(f32) * oh.astype(f32), axis=-1,
                        keepdims=True)  # [N, 1]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )
        if scale != 1.0:
            s = s * scale
        if mask_ref is not None:
            m = mask_ref[0, h if mask_ref.shape[1] > 1 else 0]
            if m.dtype == jnp.bool_:
                s = jnp.where(m, s, mask_value)
            else:
                s = s + m.astype(f32)
        pb = jnp.exp(s - lse_ref[0, h]).astype(x.dtype)  # lse [N,1] bcasts
        dv = jax.lax.dot_general(  # p.T @ gh → [N, dh]
            pb, gh, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        dp_scr[...] = jax.lax.dot_general(  # gh @ v.T → [N, N]
            gh, v, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )
        ds = (pb.astype(f32) * (dp_scr[...] - delta)).astype(x.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )
        dk = jax.lax.dot_general(  # ds.T @ q → [N, dh]
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        if scale != 1.0:
            dq = dq * scale
            dk = dk * scale
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
    # three slice stores on the section dim (not jnp.stack: slice
    # assignment is the store pattern the chip-proven kernels use)
    for sec, cs in enumerate((dqs, dks, dvs)):
        dqkv_ref[0, :, sec, :] = jnp.concatenate(
            [c.astype(dqkv_ref.dtype) for c in cs], axis=1
        )


_GROUPED_BWD_VMEM_BYTES = 64 * 1024 * 1024


def grouped_bwd_vmem_ok(
    n: int, d: int, num_heads: int, elem_bytes: int = 2,
    has_mask: bool = False, head_group: int = 2,
    limit: int = _GROUPED_BWD_VMEM_BYTES * 2 // 3,
) -> bool:
    """VMEM fit for the head-grouped packed backward: the dp-scratch
    serialization keeps one head's panels live (s/dp f32 + pb/ds in the
    compute dtype), plus double-buffered lane-group operands and one mask
    panel (float masks are shipped bf16 — the model's additive masks are
    0/−1e2, bf16-exact).  The kernel asks Mosaic for a raised 64 MiB
    scope (like the int8 grouped kernel; v5e has 128 MiB physical) —
    the default 16 MiB scope rejects even N=785 unmasked, where Mosaic's
    real stack allocation (17.93 MiB measured, r4) runs ~1.5× this
    panel accounting (11.8 MiB est.).  The gate admits 2/3 of the scope
    (ADVICE r4: 2/3 × 1.5 = the full scope, so the measured gap is
    covered; the earlier 3/4 only covered a 1.33× gap and shapes in the
    (42.7, 48] MiB estimate band could pass the gate yet fail Mosaic
    compile instead of dispatching to flash)."""
    if (head_group * (d // num_heads)) % 128:
        return False
    if num_heads % head_group:
        return False

    def pad(x, m):
        return -(-x // m) * m

    panel = pad(n, 8) * pad(n, 128)
    panels = panel * (4 + 4 + 2 * elem_bytes)
    gw = head_group * (d // num_heads)
    io = 2 * (2 * n * 3 * gw + 2 * n * gw) * elem_bytes
    m_bytes = 2 * panel * 2 if has_mask else 0
    return panels + io + m_bytes <= limit


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "mask_value", "head_group"),
)
def _packed_backward_grouped(qkv, mask, out, lse, g, num_heads, scale,
                             mask_value, head_group=2):
    b, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    hg = head_group
    gw = hg * dh
    qkv4 = qkv.reshape(b, n, 3, d)
    # lse rides with a trailing singleton (same trick as the grouped
    # forward's lse OUTPUT): a [1,hg,n] block is Mosaic-illegal for hg<8
    # (sublane dim must be 8-divisible or full), while [1,hg,n,1] puts n
    # in the sublane slot where block==array passes the legality check.
    operands = [qkv4, g, out, lse[..., None]]
    in_specs = [
        pl.BlockSpec((1, n, 3, gw), lambda i, j: (i, 0, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, gw), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, gw), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, n, 1), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    has_mask = mask is not None
    if has_mask:
        hm = mask.shape[1]
        # float masks ride bf16: the model's additive masks are 0/−1e2
        # (bf16-exact); halves the dominant VMEM operand at long N.
        mdtype = jnp.bool_ if mask.dtype == jnp.bool_ else jnp.bfloat16
        mb = jnp.broadcast_to(mask.astype(mdtype), (b, hm, n, n))
        if hm == 1:
            mspec = pl.BlockSpec((1, 1, n, n), lambda i, j: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        else:
            mspec = pl.BlockSpec((1, hg, n, n), lambda i, j: (i, j, 0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs.append(mspec)
        operands.append(mb)

    def kernel(*refs):
        qr, gr, orr, lr = refs[:4]
        mr = refs[4] if has_mask else None
        dref = refs[5] if has_mask else refs[4]
        scr = refs[6] if has_mask else refs[5]
        _kernel_packed_bwd_grouped(
            qr, gr, orr, lr, mr, dref, scr, head_group=hg, dh=dh,
            scale=scale, mask_value=mask_value,
        )

    dqkv4 = pl.pallas_call(
        kernel,
        grid=(b, num_heads // hg),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n, 3, gw), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, 3, d), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * num_heads * n * n * dh,
            bytes_accessed=qkv.size * 2 * 2 + 2 * b * n * d * 2,
            transcendentals=b * num_heads * n * n,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_GROUPED_BWD_VMEM_BYTES,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(*operands)
    return dqkv4.reshape(b, n, d3)


def packed_bwd_vmem_ok(
    n: int, d: int, num_heads: int, elem_bytes: int = 2,
    has_mask: bool = False, limit: int = 14 * 1024 * 1024,
) -> bool:
    """VMEM fit for the packed backward kernel: H head-chains each keep
    ~2 live [N,N] f32 panels (p and dp; s and ds fuse into them), plus
    double-buffered qkv/g/o/dqkv rows."""

    def pad(x, m):
        return -(-x // m) * m

    panels = num_heads * 2 * pad(n, 8) * pad(n, 128) * 4
    io = 2 * (2 * n * 3 * d + 2 * n * d) * elem_bytes
    m_bytes = 2 * pad(n, 8) * pad(n, 128) * 4 if has_mask else 0
    return panels + io + m_bytes <= limit


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "mask_value", "block_b")
)
def _packed_backward(qkv, mask, out, lse, g, num_heads, scale, mask_value,
                     block_b=1):
    b, n, d3 = qkv.shape
    while b % block_b:
        block_b //= 2
    operands = [qkv, g, out, lse]
    in_specs = [
        pl.BlockSpec((block_b, n, d3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, n, d3 // 3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, n, d3 // 3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, num_heads, n), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    has_mask = mask is not None
    if has_mask:
        hm = mask.shape[1]
        mdtype = jnp.bool_ if mask.dtype == jnp.bool_ else jnp.float32
        mb = jnp.broadcast_to(mask.astype(mdtype), (b, hm, n, n))
        in_specs.append(
            pl.BlockSpec((block_b, hm, n, n), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(mb)

    def kernel(*refs):
        qr, gr, orr, lr = refs[:4]
        mr = refs[4] if has_mask else None
        dref = refs[5] if has_mask else refs[4]
        _kernel_packed_bwd(qr, gr, orr, lr, mr, dref, num_heads=num_heads,
                           scale=scale, mask_value=mask_value)

    return pl.pallas_call(
        kernel,
        grid=(b // block_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, n, d3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d3), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * num_heads * n * n * (d3 // 3 // num_heads),
            bytes_accessed=qkv.size * 2 * 2 + 2 * b * n * (d3 // 3) * 2,
            transcendentals=b * num_heads * n * n,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(*operands)


def _packed_bwd(num_heads, scale, mask_value, res, g):
    """Backward from the saved per-head lse — no softmax-stat recompute.

    Regimes (chosen at trace time from the static shapes):
    * all-heads packed kernel while `packed_bwd_vmem_ok` (N ≲ 256 at
      H=12) — one image per program, dqkv emitted packed [N,3D];
    * head-grouped packed kernel while `grouped_bwd_vmem_ok` (mid/long
      regime, covers multistate's 816-token soft-masked layers) — grid
      (B, H/2), dp routed through a VMEM scratch so only one head's
      [N,N] panels are ever live;
    * beyond that: the shared Pallas flash dQ/dKV kernels
      (ops/flash_attention.py) for long sequences / large transients,
      or closed-form XLA math for small ones (at short sequences the
      Pallas custom-call boundary loses to XLA's fusion — ViT-B train:
      566 vs 491 img/s, benchmarks/bench_train.py).
    The r2 XLA-*recompute* backward (re-running a full forward) is gone
    in every regime."""
    qkv, mask, out, lse = res
    b, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads

    impl = _BWD_IMPL
    if impl == "auto":
        if packed_bwd_vmem_ok(n, d, num_heads, elem_bytes=qkv.dtype.itemsize,
                              has_mask=mask is not None):
            impl = "kernel"
        elif grouped_bwd_vmem_ok(n, d, num_heads,
                                 elem_bytes=qkv.dtype.itemsize,
                                 has_mask=mask is not None):
            impl = "grouped"
        elif n >= 512 or b * num_heads * n * n * 4 > _CLOSED_FORM_MAX_BYTES:
            impl = "flash"
        else:
            impl = "closed"

    if impl == "kernel":
        dqkv = _packed_backward(
            qkv, mask, out, lse, g, num_heads, scale, mask_value
        )
        return dqkv, None
    if impl == "grouped":
        dqkv = _packed_backward_grouped(
            qkv, mask, out, lse, g, num_heads, scale, mask_value
        )
        return dqkv, None

    q, k, v = _unpack(qkv, num_heads)
    o4 = out.reshape(b, n, num_heads, dh).transpose(0, 2, 1, 3)
    g4 = g.reshape(b, n, num_heads, dh).transpose(0, 2, 1, 3)

    if impl == "flash":
        from msvit_tpu.ops.flash_attention import flash_attention_bwd

        dq, dk, dv = flash_attention_bwd(
            q, k, v, o4, g4, lse, mask, scale=scale, mask_value=mask_value
        )
    else:
        f32 = jnp.float32
        s = jnp.einsum(
            "bhqe,bhke->bhqk", q, k, preferred_element_type=f32
        ) * scale
        if mask is not None:
            if mask.dtype == jnp.bool_:
                s = jnp.where(mask, s, mask_value)
            else:
                s = s + mask.astype(f32)
        p = jnp.exp(s - lse[..., None])  # [B,H,N,N]
        g32 = g4.astype(f32)
        dv = jnp.einsum("bhqk,bhqe->bhke", p, g32, preferred_element_type=f32)
        dp = jnp.einsum(
            "bhqe,bhke->bhqk", g32, v.astype(f32), preferred_element_type=f32
        )
        delta = jnp.sum(g32 * o4.astype(f32), axis=-1, keepdims=True)
        ds = p * (dp - delta)
        dq = jnp.einsum(
            "bhqk,bhke->bhqe", ds, k.astype(f32), preferred_element_type=f32
        ) * scale
        dk = jnp.einsum(
            "bhqk,bhqe->bhke", ds, q.astype(f32), preferred_element_type=f32
        ) * scale

    dqkv = (
        jnp.stack(
            [dq.astype(qkv.dtype), dk.astype(qkv.dtype), dv.astype(qkv.dtype)],
            axis=0,
        )  # [3, B, H, N, dh]
        .transpose(1, 3, 0, 2, 4)  # [B, N, 3, H, dh]
        .reshape(b, n, d3)
    )
    return dqkv, None


_packed.defvjp(_packed_fwd, _packed_bwd)


def _kernel_int8(qkv_ref, sc_ref, o_ref, *, num_heads, scale):
    """int8-in / int8-or-bf16-out packed attention.

    qkv_ref: [tb, N, 3D] int8 (per-section quantized GEMM output).
    sc_ref:  SMEM [1, 4] f32 = [s_q, s_k, s_v, inv_s_out];
             inv_s_out == 0.0 means emit bf16 instead of int8.
    """
    tb = qkv_ref.shape[0]
    d3 = qkv_ref.shape[-1]
    d = d3 // 3
    dh = d // num_heads
    s_q = sc_ref[0, 0]
    s_k = sc_ref[0, 1]
    s_v = sc_ref[0, 2]
    inv_s_out = sc_ref[0, 3]
    int8_out = o_ref.dtype == jnp.int8
    for e in range(tb):
        x = qkv_ref[e]
        outs = []
        for h in range(num_heads):
            q = x[:, h * dh : (h + 1) * dh]
            k = x[:, d + h * dh : d + (h + 1) * dh]
            v = x[:, 2 * d + h * dh : 2 * d + (h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (scale * s_q * s_k)
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            l = jnp.sum(p, axis=-1, keepdims=True)
            # probs are in [0,1] exactly (p = exp(s - max) <= 1), so
            # p*127 <= 127 needs no clip, and a truncating cast replaces
            # round (saves a full [N,N] VPU pass; ~8% kernel time —
            # benchmarks/proto_packed_int8_r3.py; bias -0.5/254 per prob)
            pq = (p * 127.0).astype(jnp.int8)
            o = jax.lax.dot_general(
                pq, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            l = jnp.where(l == 0.0, 1.0, l)
            o = o * (s_v / 127.0) / l
            if int8_out:
                outs.append(
                    jnp.clip(jnp.round(o * inv_s_out), -127, 127).astype(
                        jnp.int8
                    )
                )
            else:
                outs.append(o.astype(jnp.bfloat16))
        o_ref[e] = jnp.concatenate(outs, axis=1)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "int8_out", "block_b")
)
def packed_attention_int8(
    qkv_q: jnp.ndarray,  # [B, N, 3D] int8
    section_scales: jnp.ndarray,  # [3] f32 dequant scales for q|k|v
    num_heads: int,
    out_inv_scale: Optional[jnp.ndarray] = None,  # scalar f32; None -> bf16
    scale: Optional[float] = None,
    int8_out: bool = False,
    block_b: int = 1,
):
    """Fully-int8 packed self-attention for the serving path.

    The QKV GEMM quantizes its output per section (q/k/v) with calibrated
    scales; this kernel runs both attention matmuls on the MXU in int8
    (probs quantized at a fixed 1/127 — they live in [0,1]), and can emit
    int8 ready for the output projection (``int8_out`` with
    ``out_inv_scale``), halving every HBM tensor on the attention path.
    Inference-only (no VJP) — training uses `packed_attention`.
    """
    b, n, d3 = qkv_q.shape
    d = d3 // 3
    if scale is None:
        scale = 1.0 / (d // num_heads) ** 0.5
    while b % block_b:
        block_b //= 2
    inv = (
        jnp.zeros((), jnp.float32)
        if out_inv_scale is None
        else jnp.asarray(out_inv_scale, jnp.float32)
    )
    sc = jnp.concatenate(
        [jnp.asarray(section_scales, jnp.float32).reshape(3), inv.reshape(1)]
    ).reshape(1, 4)
    out_dtype = jnp.int8 if int8_out else jnp.bfloat16
    return pl.pallas_call(
        functools.partial(_kernel_int8, num_heads=num_heads, scale=float(scale)),
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, n, d3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_b, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * n * n * (d // num_heads),
            bytes_accessed=qkv_q.size + b * n * d,
            transcendentals=b * num_heads * n * n,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(qkv_q, sc)


_LN127 = 4.8441870864585885  # log(127): exp(s - mx + _LN127) = 127·p


def _kernel_int8_grouped(qkv_ref, sc_ref, mask_ref, o_ref, *,
                         head_group, dh, scale, mask_value):
    """Head-grouped int8 attention with mask support (one image ×
    `head_group` heads per program) — the int8 serving kernel for the
    mid/long masked regime (multistate's 816-token soft-masked trunk
    layers; the all-heads `_kernel_int8` stacks every head's [N,N] f32
    scores and has no mask input).  Runs in a raised 64MB VMEM scope so
    Mosaic fuses the [N,N] elementwise chain instead of serializing it
    through a scratch (the scratch variant cost 9.5 vs bf16's 6.4
    ms/layer-equiv at N=816 — proto_msint8_parts.py).  VPU passes over
    the scores are the budget; unlike the bf16 inference kernel the row
    max CANNOT be shaved: `(127·p).astype(int8)` truncates, so probs
    must peak at exactly 1 per row for the quantization grid to carry
    any information.  The exp emits pre-scaled 127·p directly (one
    transcendental pass, no separate multiply), and the row sum rides
    the MXU as a second pq·ones dot (see inline comment — Mosaic
    rejects the int8 ones-column concat)."""
    f32 = jnp.float32
    s_q = sc_ref[0, 0]
    s_k = sc_ref[0, 1]
    s_v = sc_ref[0, 2]
    inv_s_out = sc_ref[0, 3]
    int8_out = o_ref.dtype == jnp.int8
    x = qkv_ref[0]  # [N, 3, gw] int8
    outs = []
    for h in range(head_group):
        q = x[:, 0, h * dh : (h + 1) * dh]
        k = x[:, 1, h * dh : (h + 1) * dh]
        v = x[:, 2, h * dh : (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(f32) * (scale * s_q * s_k)
        if mask_ref is not None:
            m = mask_ref[0, h if mask_ref.shape[1] > 1 else 0]
            if m.dtype == jnp.bool_:
                s = jnp.where(m, s, mask_value)
            else:
                s = s + m.astype(f32)
        mx = jnp.max(s, axis=-1, keepdims=True)
        pq = jnp.exp(s - mx + _LN127).astype(jnp.int8)  # 127·p, truncating
        o1 = jax.lax.dot_general(
            pq, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(f32)
        # Row sum Σpq as a second MXU dot against an int8 ones [N, 1]
        # (dh pads to the 128-lane tile either way; Mosaic rejects an
        # int8 [N,dh]++[N,1] concat — "offset mismatch on non-concat
        # dimension" at N=816 on real hardware).  Normalizing by Σpq
        # (the QUANTIZED probs' sum) also cancels the truncation bias
        # that dividing by the f32 Σp would leave in.
        ones = jnp.ones((v.shape[0], 1), jnp.int8)
        l = jax.lax.dot_general(
            pq, ones, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(f32)
        l = jnp.maximum(l, 1.0)  # Σpq ≥ 127 (row max)
        o = o1 * (s_v / l)
        if int8_out:
            outs.append(
                jnp.clip(jnp.round(o * inv_s_out), -127, 127).astype(jnp.int8)
            )
        else:
            outs.append(o.astype(jnp.bfloat16))
    o_ref[0] = jnp.concatenate(outs, axis=1)


# The kernel asks Mosaic for a raised VMEM scope (v5e has 128 MiB
# physical; the 16 MiB default scope rejected bs32 @ N=816 by 856 KiB).
# The gate admits up to 3/4 of it so the measured ~1.3x gap between this
# panel accounting and Mosaic's real stack allocation stays covered.
_INT8_GROUPED_VMEM_BYTES = 64 * 1024 * 1024


def int8_grouped_vmem_ok(
    n: int, d: int, num_heads: int, has_mask: bool = True,
    head_group: int = 2,
    limit: int = _INT8_GROUPED_VMEM_BYTES * 3 // 4,
) -> bool:
    """VMEM fit for the head-grouped int8 kernel: one head's fused
    elementwise chain holds a few [N,N] panels live (scores f32 + the
    int32 dot result + temps + pq int8), plus a bf16 mask panel and
    double-buffered int8 lane-group operands."""
    if (head_group * (d // num_heads)) % 128:
        return False
    if num_heads % head_group:
        return False

    def pad(x, m):
        return -(-x // m) * m

    panel = pad(n, 8) * pad(n, 128)
    panels = panel * (4 + 4 + 4 + 4 + 1)  # s_scr + p + i32 acc + tmp + pq
    gw = head_group * (d // num_heads)
    io = 2 * (n * 3 * gw + n * gw)  # int8 in / ≤bf16 out, double-buffered
    m_bytes = 2 * panel * 2 if has_mask else 0
    return panels + io + m_bytes <= limit


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "int8_out", "head_group",
                     "mask_value"),
)
def _packed_int8_grouped(qkv_q, sc, mask, num_heads, scale, int8_out,
                         head_group=2,
                         mask_value=DEFAULT_MASK_VALUE):
    b, n, d3 = qkv_q.shape
    d = d3 // 3
    dh = d // num_heads
    hg = head_group
    gw = hg * dh
    qkv4 = qkv_q.reshape(b, n, 3, d)
    operands = [qkv4, sc]
    in_specs = [
        pl.BlockSpec((1, n, 3, gw), lambda i, g: (i, 0, 0, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4), lambda i, g: (0, 0), memory_space=pltpu.SMEM),
    ]
    has_mask = mask is not None
    if has_mask:
        hm = mask.shape[1]
        # float masks ride bf16 (the model's additive masks are 0/−1e2,
        # bf16-exact) — halves the dominant HBM operand at long N
        mdtype = jnp.bool_ if mask.dtype == jnp.bool_ else jnp.bfloat16
        mb = jnp.broadcast_to(mask.astype(mdtype), (b, hm, n, n))
        if hm == 1:
            mspec = pl.BlockSpec((1, 1, n, n), lambda i, g: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        else:
            mspec = pl.BlockSpec((1, hg, n, n), lambda i, g: (i, g, 0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs.append(mspec)
        operands.append(mb)

    def kernel(*refs):
        qr, scr_ = refs[:2]
        mr = refs[2] if has_mask else None
        o_r = refs[3] if has_mask else refs[2]
        _kernel_int8_grouped(qr, scr_, mr, o_r, head_group=hg,
                             dh=dh, scale=scale, mask_value=mask_value)

    out_dtype = jnp.int8 if int8_out else jnp.bfloat16
    return pl.pallas_call(
        kernel,
        grid=(b, num_heads // hg),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n, gw), lambda i, g: (i, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_INT8_GROUPED_VMEM_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * n * n * dh,
            bytes_accessed=qkv_q.size + b * n * d,
            transcendentals=b * num_heads * n * n,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(*operands)


def packed_attention_int8_masked(
    qkv_q: jnp.ndarray,  # [B, N, 3D] int8
    section_scales: jnp.ndarray,  # [3] f32 dequant scales for q|k|v
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,  # [B, 1|H, N, N] bool or additive
    out_inv_scale: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    int8_out: bool = False,
    mask_value: float = DEFAULT_MASK_VALUE,
):
    """Fully-int8 packed self-attention with mask support — the serving
    kernel for masked trunks (the multistate encoder's soft cluster
    masks, reference `modeling_msvitencoder.py:146`).  Head-grouped grid
    (B, H/2) in a raised VMEM scope, so it also covers the mid/long
    regime where the all-heads `packed_attention_int8` overflows VMEM.
    Inference-only (no VJP).

    Know its cost model before choosing it over the bf16 packed kernel:
    the [N,N] VPU passes dominate at long N and the row max is
    irreducible here (prob quantization needs per-row peak 1), so this
    kernel's best case ≈ the bf16 shaved kernel + one reduction pass —
    it wins only where the int8 HBM savings (qkv + mask at half width)
    or the int8 pv dot matter (see benchmarks/proto_msint8_parts.py and
    RESULTS.md)."""
    b, n, d3 = qkv_q.shape
    d = d3 // 3
    if d % num_heads:
        raise ValueError(f"D {d} not divisible by num_heads {num_heads}")
    if scale is None:
        scale = 1.0 / (d // num_heads) ** 0.5
    if mask is not None and mask.ndim != 4:
        raise ValueError(f"mask must be [B, 1|H, N, N]; got {mask.shape}")
    if not int8_grouped_vmem_ok(n, d, num_heads, has_mask=mask is not None):
        raise ValueError(
            f"int8 grouped kernel does not fit VMEM at N={n}, D={d}; "
            "dequantize and use fused/flash attention instead"
        )
    inv = (
        jnp.zeros((), jnp.float32)
        if out_inv_scale is None
        else jnp.asarray(out_inv_scale, jnp.float32)
    )
    sc = jnp.concatenate(
        [jnp.asarray(section_scales, jnp.float32).reshape(3), inv.reshape(1)]
    ).reshape(1, 4)
    return _packed_int8_grouped(
        qkv_q, sc, mask, num_heads, float(scale), int8_out,
        mask_value=float(mask_value),
    )


def packed_vmem_ok(
    n: int, d: int, num_heads: int, elem_bytes: int = 2,
    has_mask: bool = False, limit: int = 14 * 1024 * 1024,
) -> bool:
    """Whether the packed kernel's per-program VMEM footprint fits.

    Mosaic stacks every head's [N,N] f32 scores concurrently (the python
    head loop creates H independent dataflow chains — measured 44.9 MB
    at [8,12,816]: 12×2.66 MB scores + double-buffered operands, vs the
    16 MB scoped limit).  Callers should fall back to the fused/flash
    kernels (grid over heads) beyond this."""

    def pad(x, m):
        return -(-x // m) * m

    scores = num_heads * pad(n, 8) * pad(n, 128) * 4
    io = 2 * (n * 3 * d + n * d) * elem_bytes  # double-buffered qkv + out
    m_bytes = 2 * pad(n, 8) * pad(n, 128) * 4 if has_mask else 0
    return scores + io + m_bytes <= limit


def packed_attention(
    qkv: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    mask_value: float = DEFAULT_MASK_VALUE,
) -> jnp.ndarray:
    """Self-attention over packed QKV.

    Args:
      qkv: [B, N, 3*D] — the fused QKV projection output, laid out as
        [q(H heads x dh) | k(...) | v(...)] along the last dim.
      num_heads: H; head_dim = D // H.
      mask: optional [B, 1|H, N, N]; bool (True = attend) or additive float.
      scale: defaults to 1/sqrt(head_dim).

    Returns: [B, N, D] attention output (pre-projection), same dtype as qkv.

    Bounded-logit assumption (inference path only, ADVICE r4): the
    no-grad kernel uses a shaved softmax that CLAMPS scaled logits to
    ±80 instead of subtracting the row max.  For post-LN trunks (every
    pretrained/fine-tuned checkpoint this framework imports or trains
    with qk_norm) |logits| ≪ 80 and the result is exact; a checkpoint
    whose logits exceed 80 (observed only in from-scratch runs WITHOUT
    qk-norm, which this kernel's own training path handles exactly via
    true-lse softmax) would have its >80 logits flattened toward uniform
    attention rather than erroring.  Serve such checkpoints through the
    xla/fused paths (`attn_implementation="fused"`), or train with
    qk_norm.  The training path (under jax.grad, with_lse) is exact at
    any logit scale.
    """
    b, n, d3 = qkv.shape
    if d3 % 3:
        raise ValueError(f"last dim {d3} not 3*D")
    d = d3 // 3
    if d % num_heads:
        raise ValueError(f"D {d} not divisible by num_heads {num_heads}")
    if scale is None:
        scale = 1.0 / (d // num_heads) ** 0.5
    if mask is not None and mask.ndim != 4:
        raise ValueError(f"mask must be [B, 1|H, N, N]; got {mask.shape}")
    return _packed(qkv, mask, num_heads, float(scale), float(mask_value))
