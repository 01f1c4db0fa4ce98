"""Packed-qkv attention kernel prototype.

Consumes the qkv projection output in its natural [B, N, 3*D] layout
(fat contiguous rows = efficient DMA), splits heads inside VMEM, writes
[B, N, D] ready for the proj GEMM.  Avoids the [3,B,H,N,64] HBM
transposes and the narrow-minor-dim DMA that made the old fused kernel
4.6 ms/layer of pure DMA.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

B, N, D, H, DH = 512, 197, 768, 12, 64
ITERS = 10
REPS = 4
SCALE = 1.0 / DH**0.5


def bench(name, run, *args):
    def f(a0, rest, i):
        acc = jnp.float32(0)
        for j in range(REPS):
            o = run(a0 + (i + j) * 1e-6, *rest)
            acc = acc + jnp.sum(o.astype(jnp.float32))
        return acc

    fj = jax.jit(f)
    try:
        float(fj(args[0], args[1:], 0.0))
    except Exception as e:
        print(f"{name:56s} FAILED {type(e).__name__}: {str(e)[:140]}")
        return None
    t0 = time.perf_counter()
    for i in range(ITERS):
        s = fj(args[0], args[1:], float(i + 1))
    float(s)
    dt = (time.perf_counter() - t0) / ITERS / REPS * 1000
    print(f"{name:56s} {dt:8.2f} ms/layer")
    return dt


# ---- packed kernel: per-head lane slices ----
def pk_kernel(qkv_ref, o_ref):
    tb = qkv_ref.shape[0]
    for e in range(tb):
        x = qkv_ref[e]  # [N, 3D]
        outs = []
        for h in range(H):
            q = x[:, h * DH : (h + 1) * DH]
            k = x[:, D + h * DH : D + (h + 1) * DH]
            v = x[:, 2 * D + h * DH : 2 * D + (h + 1) * DH]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * SCALE
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general((p / l).astype(v.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            outs.append(o.astype(jnp.bfloat16))
        o_ref[e] = jnp.concatenate(outs, axis=1)


# ---- packed kernel: one VMEM transpose to [3H, N, DH], batched dots ----
def pk_kernel_t(qkv_ref, o_ref):
    tb = qkv_ref.shape[0]
    for e in range(tb):
        x = qkv_ref[e]  # [N, 3D]
        n = x.shape[0]
        xt = x.reshape(n, 3 * H, DH).transpose(1, 0, 2)  # [3H, N, DH]
        q, k, v = xt[:H], xt[H : 2 * H], xt[2 * H :]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * SCALE
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general((p / l).astype(jnp.bfloat16), v,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)  # [H,N,DH]
        o_ref[e] = o.transpose(1, 0, 2).reshape(n, D).astype(jnp.bfloat16)


def make_packed(kernel, tb):
    def run(qkv):  # [B, N, 3D] bf16
        return pl.pallas_call(
            kernel,
            grid=(B // tb,),
            in_specs=[pl.BlockSpec((tb, N, 3 * D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tb, N, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
        )(qkv)

    return run


# ---- XLA reference on packed input (transpose + einsum + transpose) ----
def xla_packed(qkv):
    t = qkv.reshape(B, N, 3, H, DH).transpose(2, 0, 3, 1, 4)
    q, k, v = t[0], t[1], t[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * SCALE
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return jnp.swapaxes(o, 1, 2).reshape(B, N, D)


def main():
    rng = jax.random.PRNGKey(0)
    qkv = jax.random.normal(rng, (B, N, 3 * D), dtype=jnp.bfloat16)

    # correctness first (small slice, vs XLA reference)
    small = qkv[:4]
    ref = xla_packed(qkv)[:4]
    for name, kern in [("slices", pk_kernel)]:
        got = make_packed(kern, 4)(qkv)[:4]
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"correctness {name}: max abs err vs XLA = {err:.4f}")

    bench("XLA packed attention (transposes + einsum)", xla_packed, qkv)
    for tb in (1, 2, 4):
        bench(f"packed lane-slices tb={tb}", make_packed(pk_kernel, tb), qkv)


if __name__ == "__main__":
    main()


# ---- squeezed: defer 1/l to the [N,64] output; exp in f32, p cast bf16 ----
def pk_kernel2(qkv_ref, o_ref):
    tb = qkv_ref.shape[0]
    for e in range(tb):
        x = qkv_ref[e]
        outs = []
        for h in range(H):
            q = x[:, h * DH : (h + 1) * DH]
            k = x[:, D + h * DH : D + (h + 1) * DH]
            v = x[:, 2 * D + h * DH : 2 * D + (h + 1) * DH]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * SCALE
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(p.astype(jnp.bfloat16), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            outs.append((o / l).astype(jnp.bfloat16))
        o_ref[e] = jnp.concatenate(outs, axis=1)


# ---- bf16 exp variant ----
def pk_kernel3(qkv_ref, o_ref):
    tb = qkv_ref.shape[0]
    for e in range(tb):
        x = qkv_ref[e]
        outs = []
        for h in range(H):
            q = x[:, h * DH : (h + 1) * DH]
            k = x[:, D + h * DH : D + (h + 1) * DH]
            v = x[:, 2 * D + h * DH : 2 * D + (h + 1) * DH]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * SCALE
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp((s - m).astype(jnp.bfloat16))
            l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            outs.append((o / l).astype(jnp.bfloat16))
        o_ref[e] = jnp.concatenate(outs, axis=1)


def main2():
    rng = jax.random.PRNGKey(0)
    qkv = jax.random.normal(rng, (B, N, 3 * D), dtype=jnp.bfloat16)
    ref = xla_packed(qkv)[:4]
    for name, kern in [("defer-l", pk_kernel2), ("bf16-exp", pk_kernel3)]:
        got = make_packed(kern, 4)(qkv)[:4]
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"correctness {name}: max abs err vs XLA = {err:.4f}")
    for tb in (1, 4):
        bench(f"packed defer-l tb={tb}", make_packed(pk_kernel2, tb), qkv)
        bench(f"packed bf16-exp tb={tb}", make_packed(pk_kernel3, tb), qkv)


if __name__ == "__main__":
    main2()
