"""One-line speed-of-light closures for subsample and saccadic (r5,
VERDICT r4 item 6 tail): are the r4 single numbers (subsample 5.28
ms/batch-32 forward, saccadic 72.4 ms/16x10 run) at their floors?

Method (same process, queued timing):

subsample — the bench config (6 layers, grid 4->x2, depth 1, open,
bs32) runs 2 coarse-to-fine iterations over a `capacity`-slot static
tree.  Floor proxy: a bare `BaseViTEncoder` (same geometry) run twice
over [32, cap+1] dense tokens — the per-iteration encoder cost with
zero glimpse-resample/policy/top-k/bookkeeping.  The gap IS the
subsample machinery.

saccadic — the 16x10 batched runner is dominated by the beam matcher
(Cholesky-Woodbury, r3: 1,868 -> 73 ms) + the ViT-B refiner on tiny
token counts.  Floor proxy: 10 chained ViT-B 12-layer encoder passes at
[16, 12, 768] (the refiner's per-glimpse cost at max context) —
everything above that is matcher + glimpse embeddings + control flow.

Prints each part, the e2e number, and the overhead share — the VERDICT
asked either a lever or "the ceiling line"; this is the measurement
behind that line.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from _timing import bench_queued

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def _encoder_chain(cfg_kw, tokens, bs, reps, tag):
    """dt of `reps` chained BaseViTEncoder passes at [bs, tokens, D]."""
    from msvit_tpu.models.base import BaseViTConfig
    from msvit_tpu.models.base.model import BaseViTEncoder

    cfg = BaseViTConfig(**cfg_kw)
    enc = BaseViTEncoder(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (bs, tokens, cfg.hidden_size), jnp.bfloat16)
    params = jax.jit(enc.init)({"params": rng}, x)

    @jax.jit
    def run(p, x0, i):
        y = x0 + i * 1e-6
        for _ in range(reps):
            y, _, _ = enc.apply(p, y)
            y = y.astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    dt = bench_queued(lambda i: run(params, x, float(i)), iters=20, warmup=3)
    print(f"  floor[{tag}]: {reps}x encoder @ [{bs},{tokens}] = "
          f"{dt*1e3:6.2f} ms")
    return dt


def bench_subsample():
    from msvit_tpu.models.subsample import SubsampleViTConfig, SubsampleViTModel

    bs = 32
    cfg = SubsampleViTConfig(
        num_hidden_layers=6, image_size=224, patch_size=16,
        initial_grid_size=4, multiplicative_grid_size=2, max_depth=1,
        nesting_mode="open",
    )
    model = SubsampleViTModel(cfg)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (bs, 224, 224, 3), jnp.float32)
    params = jax.jit(model.init)({"params": rng, "policy": rng}, pix)
    cap = cfg.capacity
    print(f"subsample: capacity={cap} tokens, 2 iterations, bs{bs}")

    @jax.jit
    def fwd(p, x, i, key):
        out = model.apply(p, x + i * 1e-6, rngs={"policy": key})
        return jnp.sum(out["last_hidden_state"].astype(jnp.float32))

    keys = jax.random.split(jax.random.PRNGKey(1), 64)
    dt = bench_queued(lambda i: fwd(params, pix, float(i), keys[i]),
                      iters=20, warmup=3)
    floor = _encoder_chain(
        dict(num_hidden_layers=6, image_size=224, patch_size=16),
        cap + 1, bs, 2, "6L-trunk",
    )
    print(f"  subsample e2e {dt*1e3:6.2f} ms/batch | machinery "
          f"{(dt-floor)*1e3:6.2f} ms ({(dt-floor)/dt*100:.0f}%)")


def bench_saccadic():
    from msvit_tpu.models.saccadic import (
        SaccadicViTConfig,
        SaccadicViTMultiStatePattern,
    )
    from msvit_tpu.models.saccadic.batched import batched_saccade_run
    from msvit_tpu.models.saccadic.embeddings import SaccadicViTEmbeddings

    B, steps = 16, 10
    cfg = SaccadicViTConfig(
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        num_patterns=((2, 512),), covariance_dim=64, beam_size=64,
        image_size=448, patch_size=128, patch_config="translation",
        pe_bias=True, matcher_solver="chol",
    )
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (B, 448, 448, 3), jnp.float32)
    embeddings = SaccadicViTEmbeddings(cfg)
    pattern = SaccadicViTMultiStatePattern(cfg)
    k_e, k_p = jax.random.split(rng)
    emb_vars = embeddings.init(k_e, pix, jnp.zeros((B, cfg.dof)))
    pat_vars = pattern.init(
        k_p, jnp.zeros((B, 1, cfg.hidden_size)),
        jnp.zeros((B, steps, cfg.hidden_size)), 1,
    )
    variables = jax.device_put({"embeddings": emb_vars, "pattern": pat_vars})

    @jax.jit
    def run(v, px):
        trace = batched_saccade_run(cfg, v, px, num_steps=steps)
        return (jnp.sum(trace["embeddings"].astype(jnp.float32))
                + jnp.sum(trace["predicted"].astype(jnp.float32))
                + jnp.sum(trace["num_saccades"]))

    print(f"saccadic: 16 imgs x {steps} glimpses, beam 64, rank-64")
    dt = bench_queued(lambda i: run(variables, pix + i * 1e-3),
                      iters=10, warmup=2)
    floor = _encoder_chain(
        dict(num_hidden_layers=12, hidden_size=768, num_attention_heads=12),
        steps + 2, B, steps, "12L-refiner",
    )
    print(f"  saccadic e2e {dt*1e3:6.1f} ms/run | matcher+embed+control "
          f"{(dt-floor)*1e3:6.1f} ms ({(dt-floor)/dt*100:.0f}%)")


if __name__ == "__main__":
    bench_subsample()
    bench_saccadic()
