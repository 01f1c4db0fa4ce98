"""dh=64 lane-fill experiments for the masked multistate attention
(r5, VERDICT r4 item 4).

r4 measured fused at 26 TF/s at the multistate trunk shape
([8,816,12,64] masked bf16) and named MXU lane/sublane underfill on
both attention matmuls as the cause.  The underfill analysis:

  QK^T  [N,64]@[64,N]  — contraction 64 of 128: <=50% fill (structural
        for dh=64; packing two heads block-diagonally spends the same
        MXU passes on zeros, so no win is available here)
  PV    [N,N]@[N,64]   — OUTPUT lanes 64 of 128: <=50% fill.  This one
        IS fixable: compute o^T = contract(v, p) over Nk instead
        ([dh,Nq] output = full Nq lanes, full Nk contraction), then
        transpose the small [64,Nq] result in-VMEM.

Variants raced here, all drop-in _kernel replacements at the fused
call's grid/blocks (hb heads per program):

  fused      the production kernel (baseline; max-subtracted softmax)
  pvt        PV transposed as above, exact softmax
  shave      production PV, shaved inference softmax (clip +-80, no max
             pass — the packed kernel's r3 trick; valid for post-LN
             serving)
  pvt+shave  both
  pvt+ones   pvt + denominator via an ones-ROW appended to v^T (row sum
             rides the same MXU dot; removes the VPU sum pass)

Usage: python benchmarks/proto_fused2_r5.py [--bs 8] [--iters 30]
Prints ms per 12 chained layers and effective TF/s for each variant.
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _timing import bench_queued

B, H, N, DH = 8, 12, 816, 64
LAYERS = 12
MASK_VALUE = -1e9


def _cdiv(a, b):
    return -(-a // b)


def make_inputs(bs):
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 4)
    q = jax.random.normal(ks[0], (bs, H, N, DH), jnp.bfloat16)
    k = jax.random.normal(ks[1], (bs, H, N, DH), jnp.bfloat16)
    v = jax.random.normal(ks[2], (bs, H, N, DH), jnp.bfloat16)
    # multistate-style soft additive mask (0 / -100 blocks), [B,1,N,N]
    seg = jax.random.randint(ks[3], (bs, N), 0, 8)
    mask = jnp.where(
        seg[:, None, :, None] == seg[:, None, None, :], 0.0, -100.0
    ).astype(jnp.float32)
    return q, k, v, mask


# ---------------------------------------------------------------------------
# kernel variants (single-pass, all-heads-in-block batched over hb)


def kernel_variant(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale, kv_len,
                   pvt, shave, ones_row):
    q = q_ref[0]  # [hb, Nq, dh]
    k = k_ref[0]
    v = v_ref[0]
    hb, nq, dh = q.shape
    nk = k.shape[1]

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [hb, Nq, Nk]
    s = s * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nq, nk), 2)
    s = s + m_ref[0].astype(jnp.float32)  # additive soft mask
    s = jnp.where(col < kv_len, s, MASK_VALUE)

    if shave:
        p = jnp.exp(jnp.clip(s, -80.0, 80.0))
        l = None
    else:
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        l = jnp.sum(p, axis=-1, keepdims=True)

    if pvt:
        outs = []
        for h in range(hb):
            ph = p[h].astype(v.dtype)  # [Nq, Nk]
            vh = v[h]  # [Nk, dh]
            if ones_row:
                v1 = jnp.concatenate(
                    [vh, jnp.ones((nk, 1), vh.dtype)], axis=1
                )  # [Nk, dh+1]
                ot = jax.lax.dot_general(  # contract Nk: [dh+1, Nq]
                    v1, ph, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o = ot.T  # [Nq, dh+1]
                denom = o[:, dh : dh + 1]
                outs.append(o[:, :dh] / jnp.where(denom == 0.0, 1.0, denom))
            else:
                ot = jax.lax.dot_general(
                    vh, ph, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [dh, Nq]
                o = ot.T
                if l is None:
                    lh = jnp.sum(p[h], axis=-1, keepdims=True)
                    outs.append(o / jnp.where(lh == 0.0, 1.0, lh))
                else:
                    lh = l[h]
                    outs.append(o / jnp.where(lh == 0.0, 1.0, lh))
        o_ref[0] = jnp.stack(outs).astype(o_ref.dtype)
    else:
        if l is None:
            l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (o / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def _pad_to(x, axis, size):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    w = [(0, 0)] * x.ndim
    w[axis] = (0, pad)
    return jnp.pad(x, w)


@functools.partial(
    jax.jit, static_argnames=("pvt", "shave", "ones_row", "hb")
)
def run_variant(q, k, v, mask, pvt=False, shave=False, ones_row=False, hb=2):
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    nq_pad = _cdiv(nq, 128) * 128
    nk_pad = _cdiv(nk, 128) * 128
    qp = _pad_to(q, 2, nq_pad)
    kp = _pad_to(k, 2, nk_pad)
    vp = _pad_to(v, 2, nk_pad)
    mb = _pad_to(_pad_to(mask.astype(jnp.float32), 2, nq_pad), 3, nk_pad)

    in_specs = [
        pl.BlockSpec((1, hb, nq_pad, dh), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hb, nk_pad, dh), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hb, nk_pad, dh), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nq_pad, nk_pad), lambda i, j: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kern = functools.partial(
        kernel_variant, scale=DH**-0.5, kv_len=nk,
        pvt=pvt, shave=shave, ones_row=ones_row,
    )
    out = pl.pallas_call(
        kern,
        grid=(b, h // hb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hb, nq_pad, dh), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, nq_pad, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq_pad * nk_pad * dh,
            bytes_accessed=(qp.size + kp.size + vp.size) * 2 + mb.size * 4,
            transcendentals=b * h * nq_pad * nk_pad,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(qp, kp, vp, mb)
    return out[:, :, :nq]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--hb", type=int, default=2)
    args = ap.parse_args()
    q, k, v, mask = make_inputs(args.bs)
    flops = 4 * args.bs * H * N * N * DH * LAYERS

    from msvit_tpu.ops.fused_attention import fused_attention

    variants = [
        ("fused-prod", lambda x: fused_attention(x, k, v, mask)),
        ("pvt", lambda x: run_variant(x, k, v, mask, pvt=True, hb=args.hb)),
        ("shave", lambda x: run_variant(x, k, v, mask, shave=True,
                                        hb=args.hb)),
        ("pvt+shave", lambda x: run_variant(x, k, v, mask, pvt=True,
                                            shave=True, hb=args.hb)),
        ("pvt+ones", lambda x: run_variant(x, k, v, mask, pvt=True,
                                           shave=True, ones_row=True,
                                           hb=args.hb)),
        ("base-hb", lambda x: run_variant(x, k, v, mask, hb=args.hb)),
    ]

    # correctness vs fused first (single layer)
    ref = fused_attention(q, k, v, mask)
    for name, fn in variants[1:]:
        got = fn(q)
        err = float(jnp.max(jnp.abs(
            got.astype(jnp.float32) - ref.astype(jnp.float32)
        )))
        print(f"parity {name:10s} max|d| = {err:.4e}")

    for name, fn in variants:
        def chained(i, fn=fn):
            x = q + i * 1e-6
            for _ in range(LAYERS):
                x = fn(x)
            return jnp.sum(x.astype(jnp.float32))

        dt = bench_queued(chained, iters=args.iters, warmup=3)
        print(f"{name:10s} {dt*1e3:7.2f} ms/12L  "
              f"{flops/dt/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
