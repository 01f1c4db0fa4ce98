"""Race the int8 serving path's two attention branches e2e (r3).

Branch A (production headline): qkv GEMM emits int8 per-section, the
int8 Pallas attention kernel runs both dots on the int8 MXU and emits
int8 — but its softmax pays 4 VPU passes over the f32 scores
(cast+scale, max, exp, trunc-quant; RESULTS.md micro-sweep) because
prob quantization NEEDS the row max to keep p in [0,1].

Branch B: qkv GEMM emits bf16 (dequant epilogue — free, per the
"shape, not epilogue" probe), the SHAVED bf16 packed kernel (r3:
clamp-no-max + exp→bf16 + MXU ones-sum = 1 VPU pass) runs attention,
and the proj GEMM re-quantizes dynamically.  Double the attention-path
HBM bytes, a fraction of the VPU work.

Branch B is just the existing `quantized_vit_apply` fallback (strip the
attn_*/proj_* keys from act_scales so int8_attn gates off).  Queued
timing, same process, back-to-back.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from _timing import bench_queued

from msvit_tpu.models.base import BaseViTConfig
from msvit_tpu.models.base.vit import ViTModel
from msvit_tpu.models.base.quantized import (
    calibrate_act_scales,
    quantize_vit_params,
    quantized_vit_apply,
)

B = 512


def main():
    cfg = BaseViTConfig()
    model = ViTModel(cfg)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (B, 224, 224, 3), dtype=jnp.float32)
    variables = jax.jit(model.init)({"params": rng}, pix[:1])
    qparams = quantize_vit_params(variables["params"])
    calib = jax.random.normal(rng, (64, 224, 224, 3), dtype=jnp.float32)
    scales = jax.jit(lambda q, x: calibrate_act_scales(q, cfg, x))(
        qparams, calib
    )
    # Branch B scales: no attn_i/proj_i -> int8_attn gates off; keep the
    # proj GEMM's dynamic quant (its static scale key is consumed by the
    # int8_attn branch only via s_proj; mm() uses act_scales.get(site)).
    scales_b = {
        k: v
        for k, v in scales.items()
        if not k.startswith("attn_")
    }

    @jax.jit
    def fwd(qp, sc, x, i):
        out = quantized_vit_apply(qp, cfg, x + i * 1e-6, act_scales=sc)
        return jnp.sum(out.astype(jnp.float32))

    for tag, sc in [("A int8-attn", scales), ("B bf16-shaved", scales_b),
                    ("A int8-attn(2)", scales)]:
        dt = min(
            bench_queued(
                lambda i: fwd(qparams, sc, pix, jnp.float32(i)), iters=10
            )
            for _ in range(3)
        )
        print(f"{tag:16s}: {dt*1e3:7.2f} ms/batch  {B/dt:7.0f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
