"""Round-3 micro-opt sweep for the int8 packed attention kernel
(`ops/packed_attention.py::_kernel_int8`): per-layer cost at the serving
shape [512, 197, 2304] int8-in.  Variants:

* block_b (batch elements per program) — amortizes per-program overhead;
* bf16 exp — the exp is the kernel's main VPU cost (~0.9 ms/pass at f32);
* truncating prob quantization (drop round+clip: p∈[0,1] exactly, so
  (p*127) needs no clip, and truncation only biases by -0.5/254);
* per-head o_ref stores instead of a 12-way lane concatenate.

Timing: queued-async, one scalar sync (benchmarks/_timing.py).
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _timing import bench_queued

B, N, D, H, DH = 512, 197, 768, 12, 64
SCALE = 1.0 / DH**0.5
REPS = 4


def kernel(qkv_ref, sc_ref, o_ref, *, exp_bf16, trunc_quant, store_heads):
    tb = qkv_ref.shape[0]
    s_q = sc_ref[0, 0]
    s_k = sc_ref[0, 1]
    s_v = sc_ref[0, 2]
    for e in range(tb):
        x = qkv_ref[e]
        outs = []
        for h in range(H):
            q = x[:, h * DH : (h + 1) * DH]
            k = x[:, D + h * DH : D + (h + 1) * DH]
            v = x[:, 2 * D + h * DH : 2 * D + (h + 1) * DH]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (SCALE * s_q * s_k)
            mx = jnp.max(s, axis=-1, keepdims=True)
            if exp_bf16:
                p = jnp.exp((s - mx).astype(jnp.bfloat16))
                l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
                p127 = p.astype(jnp.float32) * 127.0
            else:
                p = jnp.exp(s - mx)
                l = jnp.sum(p, axis=-1, keepdims=True)
                p127 = p * 127.0
            if trunc_quant:
                pq = p127.astype(jnp.int8)
            else:
                pq = jnp.clip(jnp.round(p127), 0.0, 127.0).astype(jnp.int8)
            o = jax.lax.dot_general(
                pq, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            l = jnp.where(l == 0.0, 1.0, l)
            o = o * (s_v / 127.0) / l
            if store_heads:
                o_ref[e, :, h * DH : (h + 1) * DH] = o.astype(o_ref.dtype)
            else:
                outs.append(o.astype(o_ref.dtype))
        if not store_heads:
            o_ref[e] = jnp.concatenate(outs, axis=1)


def kernel_3d(qkv_ref, sc_ref, o_ref, *, trunc_quant):
    """All heads in one batched dot + one elementwise chain over
    [H, N, N] (12x fewer VPU op launches than the per-head loop)."""
    tb = qkv_ref.shape[0]
    s_q = sc_ref[0, 0]
    s_k = sc_ref[0, 1]
    s_v = sc_ref[0, 2]
    for e in range(tb):
        x = qkv_ref[e]
        n = x.shape[0]
        q3 = x[:, :D].reshape(n, H, DH).transpose(1, 0, 2)
        k3 = x[:, D:2*D].reshape(n, H, DH).transpose(1, 0, 2)
        v3 = x[:, 2*D:].reshape(n, H, DH).transpose(1, 0, 2)
        s = jax.lax.dot_general(
            q3, k3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (SCALE * s_q * s_k)  # [H, N, N]
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p127 = p * 127.0
        pq = p127.astype(jnp.int8) if trunc_quant else jnp.clip(
            jnp.round(p127), 0.0, 127.0).astype(jnp.int8)
        o = jax.lax.dot_general(
            pq, v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # [H, N, DH]
        l = jnp.where(l == 0.0, 1.0, l)
        o = o * (s_v / 127.0) / l
        o_ref[e] = o.transpose(1, 0, 2).reshape(n, D).astype(o_ref.dtype)


def make_3d(tb=1, trunc_quant=False):
    k = functools.partial(kernel_3d, trunc_quant=trunc_quant)

    @jax.jit
    def run(qkv_q, sc):
        return pl.pallas_call(
            k,
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec((tb, N, 3 * D), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * H * N * N * DH,
                bytes_accessed=B * N * 3 * D + B * N * D,
                transcendentals=B * H * N * N,
            ),
        )(qkv_q, sc)

    return run


import math


def kernel_mxusum(qkv_ref, sc_ref, o_ref, *, trunc_quant, fold127):
    """l = sum(p) computed by the MXU via a ones-column appended to v
    (v is 64 lanes, padded to 128 anyway -> the extra column is free),
    killing the separate f32 sum pass over [N,N].  Dividing the
    quantized numerator by the identically-quantized denominator also
    cancels the truncation bias.  fold127 folds the *127 into the exp
    (exp(s - mx + ln 127)), removing one more full-size multiply pass."""
    tb = qkv_ref.shape[0]
    s_q = sc_ref[0, 0]
    s_k = sc_ref[0, 1]
    s_v = sc_ref[0, 2]
    ln127 = math.log(127.0)
    for e in range(tb):
        x = qkv_ref[e]
        n = x.shape[0]
        ones = jnp.ones((n, 1), jnp.int8)
        outs = []
        for h in range(H):
            q = x[:, h * DH : (h + 1) * DH]
            k = x[:, D + h * DH : D + (h + 1) * DH]
            v = x[:, 2 * D + h * DH : 2 * D + (h + 1) * DH]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (SCALE * s_q * s_k)
            mx = jnp.max(s, axis=-1, keepdims=True)
            if fold127:
                p127 = jnp.exp(s - mx + ln127)
            else:
                p127 = jnp.exp(s - mx) * 127.0
            if trunc_quant:
                pq = p127.astype(jnp.int8)
            else:
                pq = jnp.clip(jnp.round(p127), 0.0, 127.0).astype(jnp.int8)
            v_aug = jnp.concatenate([v, ones], axis=1)  # [N, DH+1]
            o_aug = jax.lax.dot_general(
                pq, v_aug, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [N, DH+1] int32; last col = sum(pq)
            l127 = o_aug[:, DH:].astype(jnp.float32)  # [N, 1]
            o = o_aug[:, :DH].astype(jnp.float32)
            o = o * (s_v / jnp.maximum(l127, 1.0))
            outs.append(o.astype(o_ref.dtype))
        o_ref[e] = jnp.concatenate(outs, axis=1)


def make_mxusum(tb=1, trunc_quant=False, fold127=False):
    k = functools.partial(
        kernel_mxusum, trunc_quant=trunc_quant, fold127=fold127
    )

    @jax.jit
    def run(qkv_q, sc):
        return pl.pallas_call(
            k,
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec((tb, N, 3 * D), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * H * N * N * DH,
                bytes_accessed=B * N * 3 * D + B * N * D,
                transcendentals=B * H * N * N,
            ),
        )(qkv_q, sc)

    return run


def kernel_intmax(qkv_ref, sc_ref, o_ref, *, trunc_quant):
    """Row max taken on the INT32 dot output (scale > 0 commutes with
    max), so the f32 scores never materialize: the cast+scale+exp+quant
    chain fuses into ONE elementwise pass from int32 input.  2 passes
    over [N,N] instead of 3."""
    tb = qkv_ref.shape[0]
    s_q = sc_ref[0, 0]
    s_k = sc_ref[0, 1]
    s_v = sc_ref[0, 2]
    for e in range(tb):
        x = qkv_ref[e]
        outs = []
        for h in range(H):
            q = x[:, h * DH : (h + 1) * DH]
            k = x[:, D + h * DH : D + (h + 1) * DH]
            v = x[:, 2 * D + h * DH : 2 * D + (h + 1) * DH]
            si = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [N, N] int32
            mxi = jnp.max(si, axis=-1, keepdims=True)
            c = SCALE * s_q * s_k
            p = jnp.exp((si - mxi).astype(jnp.float32) * c)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p127 = p * 127.0
            if trunc_quant:
                pq = p127.astype(jnp.int8)
            else:
                pq = jnp.clip(jnp.round(p127), 0.0, 127.0).astype(jnp.int8)
            o = jax.lax.dot_general(
                pq, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            l = jnp.where(l == 0.0, 1.0, l)
            o = o * (s_v / 127.0) / l
            outs.append(o.astype(o_ref.dtype))
        o_ref[e] = jnp.concatenate(outs, axis=1)


def make_intmax(tb=1, trunc_quant=False):
    k = functools.partial(kernel_intmax, trunc_quant=trunc_quant)

    @jax.jit
    def run(qkv_q, sc):
        return pl.pallas_call(
            k,
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec((tb, N, 3 * D), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * H * N * N * DH,
                bytes_accessed=B * N * 3 * D + B * N * D,
                transcendentals=B * H * N * N,
            ),
        )(qkv_q, sc)

    return run


def make(tb=1, exp_bf16=False, trunc_quant=False, store_heads=False):
    k = functools.partial(
        kernel, exp_bf16=exp_bf16, trunc_quant=trunc_quant,
        store_heads=store_heads,
    )

    @jax.jit
    def run(qkv_q, sc):
        return pl.pallas_call(
            k,
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec((tb, N, 3 * D), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * H * N * N * DH,
                bytes_accessed=B * N * 3 * D + B * N * D,
                transcendentals=B * H * N * N,
            ),
        )(qkv_q, sc)

    return run


def main():
    print("devices:", jax.devices())
    rng = jax.random.PRNGKey(0)
    qkv = jax.random.normal(rng, (B, N, 3 * D), jnp.float32)
    s_sec = 3.0 / 127.0
    qkv_q = jnp.clip(jnp.round(qkv / s_sec), -127, 127).astype(jnp.int8)
    sc = jnp.array([[s_sec, s_sec, s_sec, 0.0]], jnp.float32)
    # pre-stage distinct inputs so the timed loop is ONLY the kernel
    # (jnp.roll per iteration added a ~4 ms floor that buried the
    # variant differences)
    inputs = [jnp.roll(qkv_q, r, axis=0).block_until_ready()
              for r in range(4)]

    ref = None
    results = {}
    variants = [
        ("baseline (production: tb=1, f32 exp, round)", {}),
        ("tb=2", dict(tb=2)),
        ("tb=4", dict(tb=4)),
        ("tb=8", dict(tb=8)),
        ("bf16 exp", dict(exp_bf16=True)),
        ("trunc quant", dict(trunc_quant=True)),
        ("head stores", dict(store_heads=True)),
        ("tb=4 + bf16 exp + trunc + head stores",
         dict(tb=4, exp_bf16=True, trunc_quant=True, store_heads=True)),
        ("tb=8 + bf16 exp + trunc + head stores",
         dict(tb=8, exp_bf16=True, trunc_quant=True, store_heads=True)),
        ("tb=4 + trunc", dict(tb=4, trunc_quant=True)),
        ("int32 row max", dict(_intmax=True)),
        ("int32 row max + trunc", dict(_intmax=True, trunc_quant=True)),
        ("mxu-sum", dict(_mxu=True)),
        ("mxu-sum + trunc", dict(_mxu=True, trunc_quant=True)),
        ("mxu-sum + trunc + fold127",
         dict(_mxu=True, trunc_quant=True, fold127=True)),
        ("baseline again (drift check)", {}),
    ]
    if os.environ.get("SWEEP_SHORT"):
        variants = [
            ("baseline", {}),
            ("trunc quant", dict(trunc_quant=True)),
            ("int32 row max", dict(_intmax=True)),
            ("int32 row max + trunc", dict(_intmax=True, trunc_quant=True)),
            ("baseline again (drift check)", {}),
        ]
    for name, kw in variants:
        if kw.pop("_intmax", False):
            run = make_intmax(**kw)
        elif kw.pop("_mxu", False):
            run = make_mxusum(**kw)
        elif kw.pop("_3d", False):
            run = make_3d(**kw)
        else:
            run = make(**kw)
        try:
            out = run(qkv_q, sc)
            out.block_until_ready()
        except Exception as e:
            print(f"{name:48s} FAILED {type(e).__name__}: {str(e)[:100]}")
            continue
        if ref is None:
            ref = out.astype(jnp.float32)
            cos = 1.0
        else:
            o = out.astype(jnp.float32)
            cos = float(jnp.sum(ref * o) /
                        (jnp.linalg.norm(ref) * jnp.linalg.norm(o) + 1e-9))

        def f(i, run=run):
            acc = jnp.float32(0)
            for j in range(REPS):
                acc += jnp.sum(run(
                    inputs[(i + j) % len(inputs)], sc
                ).astype(jnp.float32))
            return acc

        dt = bench_queued(f, iters=8) / REPS * 1000
        results[name] = dt
        print(f"{name:48s} {dt:7.3f} ms/layer   cos vs baseline {cos:.5f}")


if __name__ == "__main__":
    main()
