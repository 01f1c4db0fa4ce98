"""Headline benchmark: ViT-B/16 inference throughput @224px on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 5,000 images/sec/chip (BASELINE.json north star; the reference
itself publishes no numbers — SURVEY §6).

Measures the int8 serving path (`models/base/quantized.py`, feature cosine
0.9994 vs the bf16 model — tests/test_quantized.py); set MSVIT_BENCH=bf16
for the bf16 path.  Methodology notes (axon tunnel): `block_until_ready`
does not reliably fence queued work, so we sync via a scalar read of a
full-tensor reduction (which also defeats dead-code elimination of the
timed computation); i-dependent inputs defeat any result memoization.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: tunnel compiles of the ViT-B graph take
# minutes; repeated bench runs (driver + local) reuse the compiled binary.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main() -> None:
    from msvit_tpu.models.base import BaseViTConfig, ViTModel

    mode = os.environ.get("MSVIT_BENCH", "int8")
    batch_size = 512
    iters = 20
    cfg = BaseViTConfig()  # ViT-B/16 @224
    model = ViTModel(cfg)

    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (batch_size, 224, 224, 3), dtype=jnp.float32)
    variables = jax.jit(model.init)({"params": rng}, pix[:1])

    if mode == "int8":
        from msvit_tpu.models.base.quantized import (
            calibrate_act_scales,
            quantize_vit_params,
            quantized_vit_apply,
        )

        qparams = quantize_vit_params(variables["params"])
        scales = jax.jit(
            lambda q, x: calibrate_act_scales(q, cfg, x)
        )(qparams, pix[:64])

        # params/scales are jit ARGUMENTS, not closure captures: captured
        # concrete arrays are inlined as HLO constants, which balloons the
        # compile payload past the remote-compile relay's request limit
        # (343 MB observed for a closure-captured f32 ViT-B)
        @jax.jit
        def _fwd(qp, sc, x, i):
            out = quantized_vit_apply(qp, cfg, x + i * 1e-6, act_scales=sc)
            return jnp.sum(out.astype(jnp.float32))

        def fwd(x, i):
            return _fwd(qparams, scales, x, i)

    else:

        @jax.jit
        def _fwd(v, x, i):
            out = model.apply(v, x + i * 1e-6)["last_hidden_state"]
            return jnp.sum(out.astype(jnp.float32))

        def fwd(x, i):
            return _fwd(variables, x, i)

    float(fwd(pix, 0.0))  # compile + warm-up, hard sync

    t0 = time.perf_counter()
    for i in range(iters):
        s = fwd(pix, float(i + 1))
    float(s)  # scalar read = hard sync
    dt = time.perf_counter() - t0

    value = batch_size * iters / dt
    print(
        json.dumps(
            {
                "metric": "vit_b16_224_inference_throughput",
                "value": round(value, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(value / 5000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
