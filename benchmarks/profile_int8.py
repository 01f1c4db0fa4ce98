"""Ablation profile of the int8 ViT-B/16 serving path on the real chip.

Times component variants at exactly the headline bench shapes (bs512,
224px, 197 tokens) to locate the gap between the current ~223 ms/batch
and the ~91 ms the int8 GEMMs alone should take at the measured 188 TF/s.

Methodology per CLAUDE.md: sync via scalar read of a full-tensor
reduction, vary inputs per iteration, amortize dispatch over iters.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from msvit_tpu.models.base import BaseViTConfig
from msvit_tpu.models.base.quantized import _layer_norm, quantize_vit_params
from msvit_tpu.ops.attention import multi_head_attention
from msvit_tpu.ops.quant import int8_matmul, quantize_activation

B, N, D, H, DH = 512, 197, 768, 12, 64
ITERS = 10


def bench(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args, 0.0))  # compile + hard sync
    t0 = time.perf_counter()
    for i in range(ITERS):
        s = f(*args, float(i + 1))
    float(s)
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:58s} {dt:8.2f} ms/batch")
    return dt


def main():
    cfg = BaseViTConfig()
    from msvit_tpu.models.base.vit import ViTModel

    rng = jax.random.PRNGKey(0)
    model = ViTModel(cfg)
    pix = jax.random.normal(rng, (1, 224, 224, 3), dtype=jnp.float32)
    params = jax.jit(model.init)({"params": rng}, pix)["params"]
    qp = quantize_vit_params(params)
    eps = cfg.layer_norm_eps

    x0 = jax.random.normal(rng, (B, N, D), dtype=jnp.bfloat16) * 0.5
    # static act scales (calibration is free at serving time)
    SCALE = jnp.float32(0.02)

    def mm(x, wp, out_dtype=jnp.bfloat16):
        return int8_matmul(x, wp["w"], wp["bias"], act_scale=SCALE, out_dtype=out_dtype)

    lp0 = qp["encoder"]["layer_0"]

    # ---- A. linear-only block stack (no attention), 12 layers ----
    def linear_only(x, i):
        x = x + i * 1e-6
        for li in range(12):
            lp = qp["encoder"][f"layer_{li}"]
            y = _layer_norm(x, lp["norm1"], eps)
            qkv = mm(y, lp["qkv"])
            v = qkv[..., 2 * D : 3 * D]
            out = mm(v, lp["proj"])
            x = x + out * lp["layer_scale1"].astype(out.dtype)
            y = _layer_norm(x, lp["norm2"], eps)
            y = mm(y, lp["fc1"])
            y = jax.nn.gelu(y, approximate=False)
            y = mm(y, lp["fc2"])
            x = x + y * lp["layer_scale2"].astype(y.dtype)
        return jnp.sum(x.astype(jnp.float32))

    # ---- B. GEMMs only: same 48 matmuls, no LN/residual/gelu ----
    def gemms_only(x, i):
        x = (x + i * 1e-6).astype(jnp.bfloat16)
        acc = jnp.float32(0)
        for li in range(12):
            lp = qp["encoder"][f"layer_{li}"]
            q1 = mm(x, lp["qkv"])
            q2 = mm(q1[..., :D], lp["proj"])
            q3 = mm(q2, lp["fc1"])
            q4 = mm(q3, lp["fc2"])
            x = q4
        return jnp.sum(x.astype(jnp.float32))

    # ---- C. attention only (xla, bf16), incl. qkv transposes, 12x ----
    qkv0 = jax.random.normal(rng, (B, N, 3 * D), dtype=jnp.bfloat16)

    def attn_xla(qkv_in, i):
        t = qkv_in + i * 1e-6
        acc = jnp.float32(0)
        for li in range(12):
            qkv = t.reshape(B, N, 3, H, DH).transpose(2, 0, 3, 1, 4)
            out, _ = multi_head_attention(
                qkv[0], qkv[1], qkv[2], implementation="xla"
            )
            out = jnp.swapaxes(out, 1, 2).reshape(B, N, D)
            acc = acc + jnp.sum(out.astype(jnp.float32))
            t = t + 1e-6
        return acc

    # ---- D. attention einsum-direct (no explicit transpose) ----
    def attn_direct(qkv_in, i):
        t = qkv_in + i * 1e-6
        acc = jnp.float32(0)
        for li in range(12):
            qkv = t.reshape(B, N, 3, H, DH)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B,N,H,dh]
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * (1.0 / DH**0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum(
                "bhqk,bkhd->bqhd",
                probs.astype(v.dtype),
                v,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            acc = acc + jnp.sum(out.astype(jnp.float32))
            t = t + 1e-6
        return acc

    # ---- E. int8 attention (per-tensor q/k/v, int8 probs) ----
    def attn_int8(qkv_in, i):
        t = qkv_in + i * 1e-6
        acc = jnp.float32(0)
        for li in range(12):
            qkv = t.reshape(B, N, 3, H, DH)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            qq, sq = quantize_activation(q, SCALE)
            kq, sk = quantize_activation(k, SCALE)
            vq, sv = quantize_activation(v, SCALE)
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", qq, kq, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (sq * sk / DH**0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            pq = jnp.clip(jnp.round(probs * 127.0), 0, 127).astype(jnp.int8)
            out = jnp.einsum(
                "bhqk,bkhd->bqhd", pq, vq, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (sv / 127.0)
            acc = acc + jnp.sum(out)
            t = t + 1e-6
        return acc

    # ---- F. LN+quantize only: 24 sites over [B,N,D] ----
    def ln_only(x, i):
        x = x + i * 1e-6
        acc = jnp.float32(0)
        for li in range(12):
            lp = qp["encoder"][f"layer_{li}"]
            y1 = _layer_norm(x, lp["norm1"], eps)
            y2 = _layer_norm(x + y1, lp["norm2"], eps)
            x = x + y2 * 1e-3
            acc = acc + jnp.sum(y1.astype(jnp.float32))
        return acc + jnp.sum(x.astype(jnp.float32))

    # ---- G. full current model body (reference point) ----
    def full_block(x, i):
        x = x + i * 1e-6
        for li in range(12):
            lp = qp["encoder"][f"layer_{li}"]
            y = _layer_norm(x, lp["norm1"], eps)
            qkv = mm(y, lp["qkv"])
            qkv = qkv.reshape(B, N, 3, H, DH).transpose(2, 0, 3, 1, 4)
            out, _ = multi_head_attention(
                qkv[0], qkv[1], qkv[2], implementation="xla"
            )
            out = jnp.swapaxes(out, 1, 2).reshape(B, N, D)
            out = mm(out, lp["proj"])
            x = x + out * lp["layer_scale1"].astype(out.dtype)
            y = _layer_norm(x, lp["norm2"], eps)
            y = mm(y, lp["fc1"])
            y = jax.nn.gelu(y, approximate=False)
            y = mm(y, lp["fc2"])
            x = x + y * lp["layer_scale2"].astype(y.dtype)
        return jnp.sum(x.astype(jnp.float32))

    # ---- H. full block with direct-einsum attention ----
    def full_block_direct(x, i):
        x = x + i * 1e-6
        for li in range(12):
            lp = qp["encoder"][f"layer_{li}"]
            y = _layer_norm(x, lp["norm1"], eps)
            qkv = mm(y, lp["qkv"]).reshape(B, N, 3, H, DH)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * (1.0 / DH**0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum(
                "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16).reshape(B, N, D)
            out = mm(out, lp["proj"])
            x = x + out * lp["layer_scale1"].astype(out.dtype)
            y = _layer_norm(x, lp["norm2"], eps)
            y = mm(y, lp["fc1"])
            y = jax.nn.gelu(y, approximate=False)
            y = mm(y, lp["fc2"])
            x = x + y * lp["layer_scale2"].astype(y.dtype)
        return jnp.sum(x.astype(jnp.float32))

    # ---- I. full block with fused Pallas attention ----
    def full_block_fused(x, i):
        x = x + i * 1e-6
        for li in range(12):
            lp = qp["encoder"][f"layer_{li}"]
            y = _layer_norm(x, lp["norm1"], eps)
            qkv = mm(y, lp["qkv"])
            qkv = qkv.reshape(B, N, 3, H, DH).transpose(2, 0, 3, 1, 4)
            out, _ = multi_head_attention(
                qkv[0], qkv[1], qkv[2], implementation="fused"
            )
            out = jnp.swapaxes(out, 1, 2).reshape(B, N, D)
            out = mm(out, lp["proj"])
            x = x + out * lp["layer_scale1"].astype(out.dtype)
            y = _layer_norm(x, lp["norm2"], eps)
            y = mm(y, lp["fc1"])
            y = jax.nn.gelu(y, approximate=False)
            y = mm(y, lp["fc2"])
            x = x + y * lp["layer_scale2"].astype(y.dtype)
        return jnp.sum(x.astype(jnp.float32))

    # ---- J. attention only, fused kernel + transposes (12x) ----
    def attn_fused(qkv_in, i):
        t = qkv_in + i * 1e-6
        acc = jnp.float32(0)
        for li in range(12):
            qkv = t.reshape(B, N, 3, H, DH).transpose(2, 0, 3, 1, 4)
            out, _ = multi_head_attention(
                qkv[0], qkv[1], qkv[2], implementation="fused"
            )
            out = jnp.swapaxes(out, 1, 2).reshape(B, N, D)
            acc = acc + jnp.sum(out.astype(jnp.float32))
            t = t + 1e-6
        return acc

    print(f"shapes: B={B} N={N} D={D}; {ITERS} iters, ms/batch")
    bench("I  full block, fused Pallas attention", full_block_fused, x0)
    bench("J  attention only, fused kernel + transposes (12x)", attn_fused, qkv0)
    bench("G  full current block stack (xla attn + transposes)", full_block, x0)
    bench("H  full block, direct-einsum attention", full_block_direct, x0)
    bench("A  linear-only stack (LN+quant+GEMM+gelu+resid)", linear_only, x0)
    bench("B  GEMMs only (48 int8 matmuls)", gemms_only, x0)
    bench("F  LN+quantize only (24 sites)", ln_only, x0)
    bench("C  attention only, xla + transposes (12x)", attn_xla, qkv0)
    bench("D  attention only, direct einsum (12x)", attn_direct, qkv0)
    bench("E  attention only, int8 direct (12x)", attn_int8, qkv0)


if __name__ == "__main__":
    main()
