"""Multistate forward cost on the TPU (BASELINE.json config: bs8 @224,
patch 8 -> 784 tokens, spectral clustering, 12 layers).

r1 ledger: 93 ms/batch (serial per-parent clustering loop, per-call sync
methodology).  Timing here: queued-async iterations, one final sync
(benchmarks/_timing.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from _timing import bench_queued
from msvit_tpu.models.clustering import SpectralClusteringConfig
from msvit_tpu.models.multistate import (
    MultiStateViTConfig,
    MultiStateViTEncoderModel,
)


def bench(num_sample: int, eig_method: str = "subspace", iters: int = 20):
    cfg = MultiStateViTConfig(
        patch_size=8,
        image_size=224,
        pregeneration_period=4,
        generation_period=2,
        clustering=SpectralClusteringConfig(
            ncut_dim=8,
            num_sample=num_sample,
            max_clusters=16,
            eigenvalue_threshold=0.1,
            ncut_dist="rbf",
            eig_method=eig_method,
        ),
    )
    model = MultiStateViTEncoderModel(cfg)
    rng = jax.random.PRNGKey(1212)
    pix = jax.random.normal(rng, (8, 224, 224, 3), jnp.float32)
    params = jax.jit(model.init)({"params": rng, "clustering": rng}, pix[:1])

    # params are a jit ARGUMENT: closure-captured arrays get inlined as
    # HLO constants (343 MB compile payload for this graph — exceeds the
    # remote-compile relay's request limit)
    @jax.jit
    def fwd(p, x, i, key):
        out = model.apply(p, x + i * 1e-6, rngs={"clustering": key})
        return jnp.sum(out["last_hidden_state"].astype(jnp.float32))

    keys = jax.random.split(jax.random.PRNGKey(1), iters + 4)
    dt = bench_queued(
        lambda i: fwd(params, pix, float(i + 1), keys[i]), iters=iters
    )
    print(
        f"num_sample={num_sample:5d} ({eig_method}): {dt * 1e3:7.2f} ms/batch "
        f"({8 / dt:6.0f} img/s)"
    )
    return dt


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench(1024)
    bench(512)
    bench(256)
