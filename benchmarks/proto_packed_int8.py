"""int8-dot variant of the packed attention kernel: are the MXU dots or
the VPU/relayouts the kernel bottleneck?"""

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
ITERS, REPS = 10, 4
SCALE = 1.0 / DH**0.5


def bench(name, run, qkv):
    def f(a, i):
        acc = jnp.float32(0)
        for j in range(REPS):
            o = run(a + (i + j) * 1e-6)
            acc = acc + jnp.sum(o.astype(jnp.float32))
        return acc

    fj = jax.jit(f)
    try:
        float(fj(qkv, 0.0))
    except Exception as e:
        print(f"{name:56s} FAILED {type(e).__name__}: {str(e)[:140]}")
        return None
    t0 = time.perf_counter()
    for i in range(ITERS):
        s = fj(qkv, float(i + 1))
    float(s)
    dt = (time.perf_counter() - t0) / ITERS / REPS * 1000
    print(f"{name:56s} {dt:8.2f} ms/layer")
    return dt


def kernel_int8(qkv_ref, o_ref, *, rs):
    tb = qkv_ref.shape[0]
    for e in range(tb):
        x = qkv_ref[e]
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * rs), -127, 127).astype(jnp.int8)
        outs = []
        for h in range(H):
            q = xq[:, h * DH : (h + 1) * DH]
            k = xq[:, D + h * DH : D + (h + 1) * DH]
            v = xq[:, 2 * D + h * DH : 2 * D + (h + 1) * DH]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32
                                    ).astype(jnp.float32) * (SCALE / (rs * rs))
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            l = jnp.sum(p, axis=-1, keepdims=True)
            pq = jnp.clip(jnp.round(p * 127.0), 0, 127).astype(jnp.int8)
            o = jax.lax.dot_general(pq, v, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32
                                    ).astype(jnp.float32)
            outs.append((o / (l * 127.0 * rs)).astype(jnp.bfloat16))
        o_ref[e] = jnp.concatenate(outs, axis=1)


# bf16 dots but one-shot whole-x quantize skipped (current production)
def kernel_bf16(qkv_ref, o_ref):
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
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(p.astype(jnp.bfloat16), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            outs.append((o / l).astype(jnp.bfloat16))
        o_ref[e] = jnp.concatenate(outs, axis=1)


# no-exp variant: isolate softmax cost in-kernel
def kernel_noexp(qkv_ref, o_ref):
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
            o = jax.lax.dot_general((s * 0.01).astype(jnp.bfloat16), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            outs.append(o.astype(jnp.bfloat16))
        o_ref[e] = jnp.concatenate(outs, axis=1)


# no-dots variant: isolate slicing+softmax
def kernel_nodots(qkv_ref, o_ref):
    tb = qkv_ref.shape[0]
    for e in range(tb):
        x = qkv_ref[e]
        outs = []
        for h in range(H):
            q = x[:, h * DH : (h + 1) * DH]
            outs.append(q)
        o_ref[e] = jnp.concatenate(outs, axis=1)


def make(kernel, tb=1):
    def run(qkv):
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


def main():
    rng = jax.random.PRNGKey(0)
    qkv = jax.random.normal(rng, (B, N, 3 * D), dtype=jnp.bfloat16)
    ref = make(kernel_bf16)(qkv)
    got = make(functools.partial(kernel_int8, rs=25.0))(qkv)
    cos = float(jnp.sum(ref.astype(jnp.float32) * got.astype(jnp.float32)) /
                (jnp.linalg.norm(ref.astype(jnp.float32)) *
                 jnp.linalg.norm(got.astype(jnp.float32))))
    print(f"int8 kernel cosine vs bf16 kernel: {cos:.5f}")
    bench("bf16 dots (production)", make(kernel_bf16), qkv)
    bench("int8 dots", make(functools.partial(kernel_int8, rs=25.0)), qkv)
    bench("no exp (dots+slices only)", make(kernel_noexp), qkv)
    bench("no dots (slices+concat only)", make(kernel_nodots), qkv)


if __name__ == "__main__":
    main()


def kernel_purecopy(qkv_ref, o_ref):
    for e in range(qkv_ref.shape[0]):
        o_ref[e] = qkv_ref[e][:, :D]


def kernel_sliceassign(qkv_ref, o_ref):
    tb = qkv_ref.shape[0]
    for e in range(tb):
        x = qkv_ref[e]
        for h in range(H):
            o_ref[e, :, h * DH : (h + 1) * DH] = x[:, h * DH : (h + 1) * DH]


def kernel_aligned_slices(qkv_ref, o_ref):
    # all slices at offset 0 (wrong math, measures aligned-slice cost)
    tb = qkv_ref.shape[0]
    for e in range(tb):
        x = qkv_ref[e]
        outs = []
        for h in range(H):
            q = x[:, 0:DH]
            k = x[:, D : D + DH]
            v = x[:, 2 * D : 2 * D + DH]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * SCALE
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(p.astype(jnp.bfloat16), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            outs.append((o / l).astype(jnp.bfloat16))
        o_ref[e] = jnp.concatenate(outs, axis=1)


def main2():
    rng = jax.random.PRNGKey(0)
    qkv = jax.random.normal(rng, (B, N, 3 * D), dtype=jnp.bfloat16)
    for tb in (1, 2, 4, 8):
        bench(f"pure copy tb={tb} (DMA floor)", make(kernel_purecopy, tb), qkv)
    bench("slice-assign out (no concat)", make(kernel_sliceassign), qkv)
    bench("aligned slices (offset-0, wrong math)", make(kernel_aligned_slices), qkv)
