"""Subsample encoder: freeze (KV-cache) vs open mode cost on the TPU.

BASELINE.json config: bs32 @224, 6 layers, grid 4->2, depth 1, cap 80.
Benchmark rules (CLAUDE.md): vary inputs per iteration, sync via a
full-tensor-reduction scalar, amortize dispatch over many iterations.
"""

import time

import jax
import jax.numpy as jnp

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

    @jax.jit
    def fwd(params, x, key):
        out = model.apply(params, x, rngs={"policy": key})
        # full-tensor reduction so the sync can't be memoized / folded
        return jnp.sum(out["last_hidden_state"].astype(jnp.float32)) + jnp.sum(
            out["log_prob"]
        )

    keys = jax.random.split(jax.random.PRNGKey(1), iters + 3)
    # warm-up (compile)
    float(fwd(params, pix, keys[-1]))
    float(fwd(params, pix + 1e-3, keys[-2]))

    t0 = time.perf_counter()
    acc = 0.0
    for i in range(iters):
        acc += float(fwd(params, pix + i * 1e-4, keys[i]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{mode:>6}: {dt * 1e3:7.2f} ms/batch  ({32 / dt:7.0f} img/s)  [acc={acc:.3e}]")
    return dt


if __name__ == "__main__":
    print("devices:", jax.devices())
    open_dt = bench("open")
    freeze_dt = bench("freeze")
    print(f"freeze/open ratio: {freeze_dt / open_dt:.2f}x")
