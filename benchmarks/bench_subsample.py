"""Subsample encoder: freeze (KV-cache) vs open mode cost on the TPU.

BASELINE.json config: bs32 @224, 6 layers, grid 4->2, depth 1, cap 80.
Timing: queued-async iterations, one final sync (benchmarks/_timing.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from _timing import bench_queued
from msvit_tpu.models.subsample import SubsampleViTConfig, SubsampleViTModel


def bench(mode: str, iters: int = 30) -> float:
    cfg = SubsampleViTConfig(
        num_hidden_layers=6,
        image_size=224,
        patch_size=16,
        initial_grid_size=4,
        multiplicative_grid_size=2,
        max_depth=1,
        nesting_mode=mode,
    )
    model = SubsampleViTModel(cfg)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (32, 224, 224, 3), jnp.float32)
    params = jax.jit(model.init)({"params": rng, "policy": rng}, pix)

    # params as jit argument (closure capture inlines them as HLO
    # constants — bloats the remote-compile payload)
    @jax.jit
    def fwd(p, x, i, key):
        out = model.apply(p, x + i * 1e-6, rngs={"policy": key})
        return jnp.sum(out["last_hidden_state"].astype(jnp.float32)) + jnp.sum(
            out["log_prob"]
        )

    keys = jax.random.split(jax.random.PRNGKey(1), iters + 4)
    dt = bench_queued(
        lambda i: fwd(params, pix, float(i + 1), keys[i]), iters=iters
    )
    print(f"{mode:>6}: {dt * 1e3:7.2f} ms/batch  ({32 / dt:7.0f} img/s)")
    return dt


if __name__ == "__main__":
    print("devices:", jax.devices())
    open_dt = bench("open")
    freeze_dt = bench("freeze")
    print(f"freeze/open ratio: {freeze_dt / open_dt:.2f}x")
