"""Flash-attention kernel sweep on the TPU.

Target shape from VERDICT r1: [16, 12, 1600, 64] bf16 (the multistate-scale
regime where the r1 flash kernel lost to XLA 20.8 vs 9.5 ms; the fused
single-pass kernel measured 5.7 ms).  Also times the new Pallas backward
vs the XLA full-graph grad.  Timing: queued-async, one final sync.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from _timing import bench_queued
from msvit_tpu.ops.attention import xla_attention
from msvit_tpu.ops.flash_attention import _flash_forward, flash_attention
from msvit_tpu.ops.fused_attention import fused_attention


def run(name, fn, q, k, v, iters=20):
    g = jax.jit(lambda q_, k_, v_: jnp.sum(fn(q_, k_, v_).astype(jnp.float32)))
    try:
        dt = bench_queued(lambda i: g(q + i * 1e-3, k, v), iters=iters)
        print(f"{name}: {dt * 1e3:7.2f} ms")
        return dt
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:120]}")
        return None


def main():
    print("devices:", jax.devices())
    b, h, n, dh = 16, 12, 1600, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, n, dh), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, n, dh), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, n, dh), jnp.bfloat16)

    run("xla   fwd           ", lambda q_, k_, v_: xla_attention(q_, k_, v_)[0], q, k, v)
    run("fused fwd           ", fused_attention, q, k, v)

    for bq in (128, 256, 512):
        for bk in (256, 512, 1024):
            run(
                f"flash fwd bq={bq:4d} bk={bk:4d}",
                functools.partial(
                    lambda q_, k_, v_, bq=bq, bk=bk: _flash_forward(
                        q_, k_, v_, None, 0.125, -1e30, block_q=bq, block_k=bk
                    )[0]
                ),
                q, k, v,
            )

    # backward: Pallas kernels (flash custom_vjp) vs XLA full-graph grad
    def mk_grad(attn):
        return jax.jit(
            jax.grad(
                lambda q_, k_, v_: jnp.sum(attn(q_, k_, v_).astype(jnp.float32)),
                argnums=(0, 1, 2),
            )
        )

    gx = mk_grad(lambda q_, k_, v_: xla_attention(q_, k_, v_)[0])
    gf = mk_grad(flash_attention)
    gfu = mk_grad(fused_attention)
    for name, g in (("xla  ", gx), ("flash", gf), ("fused", gfu)):
        try:
            dt = bench_queued(
                lambda i: jax.tree.leaves(g(q + i * 1e-3, k, v))[0]
                .astype(jnp.float32)
                .sum(),
                iters=10,
            )
            print(f"{name} fwd+bwd: {dt * 1e3:7.2f} ms")
        except Exception as e:
            print(f"{name} fwd+bwd: FAIL {type(e).__name__}: {str(e)[:120]}")

    # agreement
    dq_f = gf(q, k, v)[0]
    dq_x = gx(q, k, v)[0]
    err = float(
        jnp.max(jnp.abs(dq_f.astype(jnp.float32) - dq_x.astype(jnp.float32)))
    )
    ref = float(jnp.max(jnp.abs(dq_x.astype(jnp.float32))))
    print(f"max |dq_flash - dq_xla| = {err:.3e} (max |dq_xla| = {ref:.3e})")


if __name__ == "__main__":
    main()
