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


def bench(num_sample: int, eig_method: str = "subspace", iters: int = 20,
          shared_anchors: bool = False, anchors_per_parent: int = 256,
          banded: bool = False, image_size: int = 224, batch: int = 8,
          late_num_sample: int = 0):
    cfg = MultiStateViTConfig(
        patch_size=8,
        image_size=image_size,
        pregeneration_period=4,
        generation_period=2,
        clustering=SpectralClusteringConfig(
            ncut_dim=8,
            num_sample=num_sample,
            max_clusters=16,
            eigenvalue_threshold=0.1,
            ncut_dist="rbf",
            eig_method=eig_method,
            shared_anchors=shared_anchors,
            anchors_per_parent=anchors_per_parent,
            late_num_sample=late_num_sample,
        ),
        banded_attention=banded,
    )
    model = MultiStateViTEncoderModel(cfg)
    rng = jax.random.PRNGKey(1212)
    pix = jax.random.normal(
        rng, (batch, image_size, image_size, 3), jnp.float32
    )
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
    tag = f"shared/{anchors_per_parent}" if shared_anchors else eig_method
    if late_num_sample:
        tag += f"+late{late_num_sample}"
    if banded:
        tag += "+banded"
    if image_size != 224:
        tag += f"@{image_size}"
    print(
        f"num_sample={num_sample:5d} ({tag}): {dt * 1e3:7.2f} ms/batch "
        f"({batch / dt:6.0f} img/s)",
        flush=True,
    )
    return dt


if __name__ == "__main__":
    print("devices:", jax.devices())
    cases = sys.argv[1:] or ["1024", "512", "256"]
    for c in cases:
        size = 224
        if c.startswith("i"):  # e.g. i448:bandedshared1024/256
            pre, _, c = c.partition(":")
            size = int(pre[1:])
        banded = c.startswith("banded")  # e.g. bandedshared1024/256
        if banded:
            c = c[len("banded"):]
        if c.startswith("shared"):
            # sharedM[/mc] e.g. shared1024/256
            body = c[len("shared"):]
            ns, _, mc = body.partition("/")
            bench(int(ns), shared_anchors=True,
                  anchors_per_parent=int(mc or 256), banded=banded,
                  image_size=size)
        else:
            # M[+lateL] e.g. 1024+late256 (per-parent anchors, smaller
            # budget for clustering calls after the first split)
            ns, _, late = c.partition("+late")
            bench(int(ns), banded=banded, image_size=size,
                  late_num_sample=int(late) if late else 0)
