"""Real-chip validation of the r5 fused-attention changes (Mosaic
legality is invisible to interpret-mode tests — CLAUDE.md).

1. exact fused (now with transposed PV) vs xla at several shapes that
   exercise different heads-per-program (hb) choices and mask dtypes;
2. gradients through the exact fused path (the training mid-regime);
3. fused_attention_inference parity at the multistate trunk shape;
4. order-reversed same-process race: inference vs exact vs xla, two
   builds each (first-executable penalty guard), at [8,816,12,64].

Usage: python benchmarks/chipcheck_fused_r5.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from _timing import bench_queued
from msvit_tpu.ops.attention import xla_attention
from msvit_tpu.ops.fused_attention import (
    fused_attention,
    fused_attention_inference,
)


def mk(b, h, n, dh, masked, dtype=jnp.bfloat16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (b, h, n, dh), dtype)
    k = jax.random.normal(ks[1], (b, h, n, dh), dtype)
    v = jax.random.normal(ks[2], (b, h, n, dh), dtype)
    mask = None
    if masked == "bool":
        mask = jax.random.bernoulli(ks[3], 0.8, (b, 1, n, n)) | (
            jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) == 0
        )
    elif masked == "soft":
        seg = jax.random.randint(ks[3], (b, n), 0, 8)
        mask = jnp.where(
            seg[:, None, :, None] == seg[:, None, None, :], 0.0, -100.0
        ).astype(jnp.float32)
    return q, k, v, mask


def maxdiff(a, b):
    return float(jnp.max(jnp.abs(
        a.astype(jnp.float32) - b.astype(jnp.float32)
    )))


def main():
    # 1/3: parity across shapes (tests hb ∈ {6, 4, 2} via N)
    shapes = [
        (4, 12, 520, 64, "soft"),
        (4, 12, 520, 64, "bool"),
        (2, 12, 640, 64, None),
        (8, 12, 816, 64, "soft"),
        (2, 6, 1024, 64, "bool"),
    ]
    for b, h, n, dh, m in shapes:
        q, k, v, mask = mk(b, h, n, dh, m)
        ref, _ = xla_attention(q, k, v, mask=mask)
        got = fused_attention(q, k, v, mask=mask)
        inf = fused_attention_inference(q, k, v, mask=mask)
        print(f"[{b},{h},{n},{dh}] mask={m}: exact|d|={maxdiff(got, ref):.2e}"
              f"  inference|d|={maxdiff(inf, ref):.2e}", flush=True)
        assert maxdiff(got, ref) < 3e-2, "exact parity"
        assert maxdiff(inf, ref) < 3e-2, "inference parity"

    # 2: grads through exact fused at a mid shape (training regime)
    q, k, v, mask = mk(2, 12, 640, 64, "soft", jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, mask=mask) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, mask=mask)[0] ** 2)

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(q, k, v)
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b_ in zip("qkv", gf, gx):
        d = maxdiff(a, b_)
        rel = d / (float(jnp.max(jnp.abs(b_))) + 1e-9)
        print(f"grad d{name}: max|d|={d:.2e} rel={rel:.2e}", flush=True)
        assert rel < 2e-2, name

    # 4: order-reversed race at the multistate trunk shape
    B, H, N, DH, L = 8, 12, 816, 64, 12
    q, k, v, mask = mk(B, H, N, DH, "soft")
    flops = 4 * B * H * N * N * DH * L

    def chain(fn):
        def run(i):
            x = q + i * 1e-6
            for _ in range(L):
                x = fn(x, k, v, mask)
            return jnp.sum(x.astype(jnp.float32))
        return run

    impls = [
        ("inference", lambda x, k, v, m: fused_attention_inference(
            x, k, v, mask=m)),
        ("exact-pvt", lambda x, k, v, m: fused_attention(x, k, v, mask=m)),
        ("xla", lambda x, k, v, m: xla_attention(x, k, v, mask=m)[0]),
    ]
    for rnd in (1, 2):
        for name, fn in impls:
            dt = bench_queued(chain(fn), iters=20, warmup=3)
            print(f"round{rnd} {name:10s} {dt*1e3:7.2f} ms/12L  "
                  f"{flops/dt/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
