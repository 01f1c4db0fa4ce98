"""Prototype kernel experiments for the int8 serving path (scratch bench).

Questions answered on the real chip:
  P1  attention: does batching tB batch-elems per program fix the fused
      kernel's per-program overhead?  What padding (208 vs 256) is best?
  P2  what TOPS does a Mosaic int8 GEMM hit at the qkv/fc shapes when the
      weight is VMEM-resident and M is a program-sized chunk?
  P3  Pallas residual+LN(+quant) vs the XLA elementwise chain.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

B, N, D, H, DH = 512, 197, 768, 12, 64
ITERS = 10


def bench(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args, 0.0))
    t0 = time.perf_counter()
    for i in range(ITERS):
        s = f(*args, float(i + 1))
    float(s)
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:58s} {dt:8.2f} ms")
    return dt


# ---------------------------------------------------------------- P1 ----
def attn_kernel_tb(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid):
    tb = q_ref.shape[0]
    for e in range(tb):
        q = q_ref[e]  # [H, Np, dh]
        k = k_ref[e]
        v = v_ref[e]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < n_valid, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[e] = (o / l).astype(o_ref.dtype)


def make_attn_tb(tb, np_pad):
    @jax.jit
    def run(q, k, v):  # [B,H,N,dh]
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, np_pad - N), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, np_pad - N), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, np_pad - N), (0, 0)))
        out = pl.pallas_call(
            functools.partial(attn_kernel_tb, scale=1.0 / DH**0.5, n_valid=N),
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec((tb, H, np_pad, DH), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
            ] * 3,
            out_specs=pl.BlockSpec((tb, H, np_pad, DH), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, np_pad, DH), q.dtype),
        )(qp, kp, vp)
        return out[:, :, :N]

    return run


# ---------------------------------------------------------------- P2 ----
def gemm_kernel(x_ref, w_ref, dq_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (acc.astype(jnp.float32) * dq_ref[:]).astype(jnp.bfloat16)


def make_gemm(m_block, k, n):
    M = B * 224  # padded token count stand-in

    @jax.jit
    def run(xq, w, dq):  # xq [M,k] int8, w [k,n] int8, dq [1,n] f32
        return pl.pallas_call(
            gemm_kernel,
            grid=(M // m_block,),
            in_specs=[
                pl.BlockSpec((m_block, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m_block, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, n), jnp.bfloat16),
        )(xq, w, dq)

    return run


# ---------------------------------------------------------------- P3 ----
def ln_quant_kernel(x_ref, g_ref, b_ref, oq_ref, *, eps, recip_s):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, -1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, -1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * g_ref[:] + b_ref[:]
    oq_ref[:] = jnp.clip(jnp.round(y * recip_s), -127, 127).astype(jnp.int8)


def make_ln_quant(m_block):
    M = B * N

    @jax.jit
    def run(x, g, b):  # x [M,D] bf16
        grid = -(-M // m_block)
        return pl.pallas_call(
            functools.partial(ln_quant_kernel, eps=1e-6, recip_s=50.0),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((m_block, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m_block, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, D), jnp.int8),
        )(x, g, b)

    return run


def main():
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, H, N, DH), dtype=jnp.bfloat16)
    k = jax.random.normal(rng, (B, H, N, DH), dtype=jnp.bfloat16) * 0.9
    v = jax.random.normal(rng, (B, H, N, DH), dtype=jnp.bfloat16) * 1.1

    print("== P1: attention, tb elems/program (12 heads each) ==")
    for tb, npad in [(1, 256), (2, 256), (4, 224), (2, 224), (8, 224)]:
        try:
            run = make_attn_tb(tb, npad)

            def f(q, k, v, i):
                o = run(q + i * 1e-6, k, v)
                return jnp.sum(o.astype(jnp.float32))

            bench(f"attn tb={tb} pad={npad} (1 layer)", f, q, k, v)
        except Exception as e:
            print(f"attn tb={tb} pad={npad} FAILED: {type(e).__name__}: {e}"[:160])

    print("== P2: int8 GEMM, VMEM-resident weight ==")
    M = B * 224
    for (kk, nn, mb) in [(768, 2304, 512), (768, 2304, 1024), (768, 2304, 2048),
                         (768, 3072, 1024), (3072, 768, 1024), (768, 768, 1024)]:
        xq = jax.random.randint(rng, (M, kk), -127, 127, dtype=jnp.int8)
        w = jax.random.randint(rng, (kk, nn), -127, 127, dtype=jnp.int8)
        dq = jnp.ones((1, nn), jnp.float32) * 1e-4
        run = make_gemm(mb, kk, nn)

        def f(xq, w, dq, i):
            o = run(xq, w, dq)
            return jnp.sum(o[::97].astype(jnp.float32)) + i * 0

        try:
            dt = bench(f"gemm {kk}x{nn} mb={mb}", f, xq, w, dq)
            tops = 2 * M * kk * nn / (dt / 1e3) / 1e12
            print(f"    -> {tops:.0f} TOPS")
        except Exception as e:
            print(f"gemm {kk}x{nn} mb={mb} FAILED: {type(e).__name__}: {e}"[:160])

    # XLA reference GEMM
    xq = jax.random.randint(rng, (M, 768), -127, 127, dtype=jnp.int8)
    w = jax.random.randint(rng, (768, 2304), -127, 127, dtype=jnp.int8)

    def xla_gemm(xq, w, i):
        acc = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return jnp.sum((acc * 1e-4).astype(jnp.float32)[::97]) + i * 0

    dt = bench("gemm 768x2304 XLA", xla_gemm, xq, w)
    print(f"    -> {2 * M * 768 * 2304 / (dt / 1e3) / 1e12:.0f} TOPS")

    print("== P3: residual+LN+quant ==")
    x = jax.random.normal(rng, (B * N, D), dtype=jnp.bfloat16)
    g = jnp.ones((1, D), jnp.float32)
    bb = jnp.zeros((1, D), jnp.float32)
    for mb in [512, 2048, 8192]:
        run = make_ln_quant(mb)

        def f(x, g, bb, i):
            o = run(x + i * 1e-6, g, bb)
            return jnp.sum(o[::97].astype(jnp.float32))

        bench(f"pallas LN+quant mb={mb}", f, x, g, bb)

    def xla_ln_quant(x, g, bb, i):
        x32 = (x + i * 1e-6).astype(jnp.float32)
        mean = jnp.mean(x32, -1, keepdims=True)
        var = jnp.var(x32, -1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-6) * g + bb
        o = jnp.clip(jnp.round(y * 50.0), -127, 127).astype(jnp.int8)
        return jnp.sum(o[::97].astype(jnp.float32))

    bench("XLA LN+quant chain", xla_ln_quant, x, g, bb)


if __name__ == "__main__":
    main()
