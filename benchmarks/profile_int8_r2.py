"""Marginal-cost profile of the current int8 path (packed attention era).

Times the full quantized_vit_apply and versions with one component
knocked out, to get in-context marginal costs.
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

from msvit_tpu.models.base import BaseViTConfig, ViTModel
from msvit_tpu.models.base.quantized import (
    _layer_norm,
    quantize_vit_params,
)
from msvit_tpu.ops.packed_attention import packed_attention
from msvit_tpu.ops.quant import int8_matmul

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
    print(f"{name:58s} {dt:8.2f} ms/batch")
    return dt


def main():
    cfg = BaseViTConfig()
    model = ViTModel(cfg)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (1, 224, 224, 3), dtype=jnp.float32)
    params = jax.jit(model.init)({"params": rng}, pix)["params"]
    qp = quantize_vit_params(params)
    eps = cfg.layer_norm_eps
    SCALE = jnp.float32(0.02)

    x0 = jax.random.normal(rng, (B, N, D), dtype=jnp.bfloat16) * 0.5

    def mm(x, wp):
        return int8_matmul(x, wp["w"], wp["bias"], act_scale=SCALE)

    def stack(x, i, *, attn=True, ln=True, mlp=True, gelu=True, resid=True):
        x = x + i * 1e-6
        for li in range(12):
            lp = qp["encoder"][f"layer_{li}"]
            y = _layer_norm(x, lp["norm1"], eps) if ln else x
            qkv = mm(y, lp["qkv"])
            if attn:
                out = packed_attention(qkv, H)
            else:
                out = qkv[..., :D]
            out = mm(out, lp["proj"])
            if resid:
                x = x + out * lp["layer_scale1"].astype(out.dtype)
            else:
                x = out
            if mlp:
                y = _layer_norm(x, lp["norm2"], eps) if ln else x
                y = mm(y, lp["fc1"])
                if gelu:
                    y = jax.nn.gelu(y, approximate=True)
                y = mm(y, lp["fc2"])
                if resid:
                    x = x + y * lp["layer_scale2"].astype(y.dtype)
                else:
                    x = y
        return jnp.sum(x.astype(jnp.float32))

    import functools

    print(f"B={B} N={N}; {ITERS} iters")
    full = bench("full stack (current)", functools.partial(stack), x0)
    bench("- attention (qkv GEMM kept)", functools.partial(stack, attn=False), x0)
    bench("- layernorms", functools.partial(stack, ln=False), x0)
    bench("- gelu", functools.partial(stack, gelu=False), x0)
    bench("- residual/layerscale", functools.partial(stack, resid=False), x0)
    bench("- mlp (attn half only)", functools.partial(stack, mlp=False), x0)

    # attention kernel alone at these shapes
    qkv0 = jax.random.normal(rng, (B, N, 3 * D), dtype=jnp.bfloat16)

    def attn_only(t, i):
        t = t + i * 1e-6
        acc = jnp.float32(0)
        for li in range(12):
            o = packed_attention(t, H)
            acc = acc + jnp.sum(o.astype(jnp.float32))
            t = t + 1e-6
        return acc

    bench("packed attention x12 alone", attn_only, qkv0)


if __name__ == "__main__":
    main()
