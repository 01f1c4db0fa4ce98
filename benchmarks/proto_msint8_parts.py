"""Per-part race at the multistate trunk shape (B=32, N=816, H=12):
where does the int8 trunk's bs32 regression (145 vs 117 ms) come from?

Parts raced back-to-back in one process:
  A. masked attention: bf16 packed (production bf16 path) vs int8 grouped
  B. trunk GEMM chain at M=B*N, K=768: bf16 vs int8 (static act scales)
  C. activation quantize pass cost (bf16 [B,N,D] -> int8)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from _timing import bench_queued
from msvit_tpu.ops.packed_attention import (
    packed_attention,
    packed_attention_int8_masked,
)
from msvit_tpu.ops.quant import int8_matmul, quantize_weight

B, N, D, H = 32, 816, 768, 12


def main():
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    qkv = jax.random.normal(k1, (B, N, 3 * D), jnp.bfloat16) * 0.5
    mbool = jax.random.uniform(k2, (B, 1, N, N)) > 0.3
    additive = jnp.where(mbool, 0.0, -100.0).astype(jnp.float32)
    qkv_q = jnp.clip(
        jnp.round(qkv.astype(jnp.float32) / 0.01), -127, 127
    ).astype(jnp.int8)
    sec = jnp.full((3,), 0.01, jnp.float32)

    @jax.jit
    def attn_bf16(x, i):
        o = packed_attention(x + i * 1e-6, H, mask=additive)
        return jnp.sum(o.astype(jnp.float32))

    @jax.jit
    def attn_int8(x, i):
        o = packed_attention_int8_masked(
            x, sec, H, mask=additive, out_inv_scale=1.0 / 0.02,
            int8_out=True,
        )
        return jnp.sum(o.astype(jnp.float32)) + i * 0.0

    @jax.jit
    def attn_int8_bf16out(x, i):
        o = packed_attention_int8_masked(x, sec, H, mask=additive)
        return jnp.sum(o.astype(jnp.float32)) + i * 0.0

    # B: GEMM chains — 4 layers of (D->3D) to model qkv, M = B*N
    M = B * N
    x0 = jax.random.normal(k3, (M, D), jnp.bfloat16) * 0.1
    ws = [jax.random.normal(jax.random.PRNGKey(7 + j), (D, 3 * D),
                            jnp.float32) * 0.02 for j in range(4)]
    wbf = [w.astype(jnp.bfloat16) for w in ws]
    wq = [quantize_weight(w) for w in ws]
    bias = jnp.zeros((3 * D,), jnp.float32)

    @jax.jit
    def chain_bf16(x, i):
        y = x + i * 1e-6
        for w in wbf:
            y = (y @ w)[:, :D]
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def chain_int8(x, i):
        y = x + i * 1e-6
        for w in wq:
            y = int8_matmul(y, w, bias, act_scale=jnp.float32(0.01))[:, :D]
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def quant_pass(x, i):
        q = jnp.clip(
            jnp.round((x + i * 1e-6).astype(jnp.float32) / 0.01), -127, 127
        ).astype(jnp.int8)
        return jnp.sum(q.astype(jnp.float32))

    races = [
        ("attn bf16 packed", lambda i: attn_bf16(qkv, float(i + 1))),
        ("attn int8 (int8 out)", lambda i: attn_int8(qkv_q, float(i + 1))),
        ("attn int8 (bf16 out)",
         lambda i: attn_int8_bf16out(qkv_q, float(i + 1))),
        ("gemm chain bf16 x4", lambda i: chain_bf16(x0, float(i + 1))),
        ("gemm chain int8 x4", lambda i: chain_int8(x0, float(i + 1))),
        ("quantize pass [B,N,D]", lambda i: quant_pass(x0, float(i + 1))),
        ("attn bf16 packed (2)", lambda i: attn_bf16(qkv, float(i + 1))),
        ("attn int8 (2)", lambda i: attn_int8(qkv_q, float(i + 1))),
    ]
    for name, fn in races:
        dt = bench_queued(fn, iters=30)
        print(f"{name:26s}: {dt * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
