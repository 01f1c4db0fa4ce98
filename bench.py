"""Headline benchmark: ViT-B/16 inference throughput @224px on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 5,000 images/sec/chip (BASELINE.json north star; the reference
itself publishes no numbers — SURVEY §6).

Methodology notes (axon tunnel): `block_until_ready` does not reliably
fence queued work over the tunnel, so we sync with a scalar read off the
final output; enough iterations amortize the tunnel roundtrip latency.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from msvit_tpu.models.base import BaseViTConfig, ViTModel

    batch_size = 512
    iters = 20
    cfg = BaseViTConfig()  # ViT-B/16, bf16 policy, auto attention
    model = ViTModel(cfg)

    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (batch_size, 224, 224, 3), dtype=jnp.float32)
    params = jax.jit(model.init)({"params": rng}, pix[:1])

    @jax.jit
    def fwd(params, x, i):
        # i-dependent input defeats any result memoization in the stack
        out = model.apply(params, x + i * 1e-6)["last_hidden_state"]
        return out, out[0, 0, 0]

    _, s = fwd(params, pix, 0.0)
    float(s)  # warm-up + compile, hard sync

    t0 = time.perf_counter()
    for i in range(iters):
        out, s = fwd(params, pix, float(i + 1))
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
