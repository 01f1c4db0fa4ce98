"""int8 GEMM rate sweep (VERDICT r2 item 1): where does the ~58%-of-peak
ceiling come from — shape (K depth / M height), the quantize epilogues,
accumulation dtype, or XLA itself?

Method: queued timing over chained GEMMs (i-dependent input, one final
scalar).  Rates in TOPS = 2·M·K·N·chain / t.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import functools

import jax
import jax.numpy as jnp

from _timing import bench_queued

M_VIT = 100864  # 512 × 197


def gemm_chain(m, k, n, chain=8, epilogue="none", acc=jnp.int32):
    """Chained GEMMs a@b with optional dequant+requant epilogue between
    links.  Same-shape links require k == n (pad the weight) — we instead
    alternate [k,n] and [n,k] weights so any shape chains."""
    kw = jax.random.randint(jax.random.PRNGKey(1), (k, n), -127, 127, jnp.int8)
    kn = jax.random.randint(jax.random.PRNGKey(2), (n, k), -127, 127, jnp.int8)

    @jax.jit
    def f(x0, i):
        x = (x0 + i).astype(jnp.int8)
        for c in range(chain):
            w = kw if c % 2 == 0 else kn
            y = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), preferred_element_type=acc
            )
            if epilogue == "none":
                # plain requant cast so the chain stays int8
                x = (y >> 7).astype(jnp.int8)
            elif epilogue == "quant":
                # production epilogue: dequant f32, scale, dynamic requant
                yf = y.astype(jnp.float32) * (1.0 / 127.0)
                s = jnp.max(jnp.abs(yf)) / 127.0 + 1e-8
                x = jnp.clip(jnp.round(yf / s), -127, 127).astype(jnp.int8)
        return jnp.sum(y.astype(jnp.float32))

    x0 = jax.random.randint(jax.random.PRNGKey(0), (m, k), -64, 64, jnp.int32)
    dt = bench_queued(lambda i: f(x0, i), iters=10)
    tops = 2.0 * m * k * n * chain / dt / 1e12
    print(
        f"int8 M={m:6d} K={k:5d} N={n:5d} chain={chain} "
        f"ep={epilogue:5s} acc={jnp.dtype(acc).name:7s}: "
        f"{dt * 1e3:7.2f} ms  {tops:6.1f} TOPS",
        flush=True,
    )
    return tops


def bf16_chain(m, k, n, chain=8):
    kw = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)
    kn = jax.random.normal(jax.random.PRNGKey(2), (n, k), jnp.bfloat16)

    @jax.jit
    def f(x0, i):
        x = (x0 + i).astype(jnp.bfloat16)
        for c in range(chain):
            w = kw if c % 2 == 0 else kn
            x = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    x0 = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32)
    dt = bench_queued(lambda i: f(x0, i), iters=10)
    tf = 2.0 * m * k * n * chain / dt / 1e12
    print(
        f"bf16 M={m:6d} K={k:5d} N={n:5d} chain={chain}: "
        f"{dt * 1e3:7.2f} ms  {tf:6.1f} TF/s",
        flush=True,
    )
    return tf


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "shapes"):
        # ViT-B shapes, no epilogue
        for k, n in [(768, 2304), (768, 3072), (3072, 768), (768, 768)]:
            gemm_chain(M_VIT, k, n)
        # depth scaling at fixed N
        for k in (768, 1536, 3072, 6144):
            gemm_chain(32768, k, 2304)
        # square peak probe
        gemm_chain(8192, 8192, 8192, chain=4)

    if which in ("all", "epilogue"):
        for k, n in [(768, 2304), (3072, 768)]:
            gemm_chain(M_VIT, k, n, epilogue="quant")

    if which in ("all", "acc"):
        gemm_chain(M_VIT, 768, 2304, acc=jnp.float32)
        gemm_chain(M_VIT, 768, 2304, acc=jnp.int32)

    if which in ("all", "bf16"):
        bf16_chain(M_VIT, 768, 2304)
        bf16_chain(8192, 8192, 8192, chain=4)
