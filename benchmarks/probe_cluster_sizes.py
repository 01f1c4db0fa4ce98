"""Probe: cluster-size distribution of the multistate bench workload.

The banded (cluster-sorted, block-skipping) attention idea wins in
proportion to the dead-block fraction of the [N, N] score matrix, which
depends on how balanced the spectral clusters are at each re-clustering
epoch.  This prints, per epoch (layers 4, 6, 8, 10 with the BASELINE
periods), the per-image cluster sizes and the resulting live-score
fraction for a 128-wide key band.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from msvit_tpu.models.clustering import SpectralClusteringConfig
from msvit_tpu.models.multistate import (
    MultiStateViTConfig,
    MultiStateViTEncoderModel,
)


def live_fraction(sizes: np.ndarray, n: int, blk: int = 128) -> float:
    """Score-matrix live fraction under cluster-sorted banding: each
    cluster of size s occupies a contiguous range; its queries touch the
    k-blocks overlapping that range (block-granular)."""
    start = 0
    live = 0
    for s in sizes:
        if s == 0:
            continue
        kmin = (start // blk) * blk
        kmax = min(-(-(start + s) // blk) * blk, -(-n // blk) * blk)
        live += s * (kmax - kmin)
        start += s
    return live / (n * n)


def main():
    cfg = MultiStateViTConfig(
        patch_size=8,
        image_size=224,
        pregeneration_period=4,
        generation_period=2,
        clustering=SpectralClusteringConfig(
            ncut_dim=8,
            num_sample=1024,
            max_clusters=16,
            eigenvalue_threshold=0.1,
            ncut_dist="rbf",
            eig_method="subspace",
            shared_anchors=True,
            anchors_per_parent=256,
        ),
    )
    model = MultiStateViTEncoderModel(cfg)
    rng = jax.random.PRNGKey(1212)
    pix = jax.random.normal(rng, (8, 224, 224, 3), jnp.float32)
    params = jax.jit(model.init)({"params": rng, "clustering": rng}, pix[:1])

    @jax.jit
    def fwd(p, x, key):
        return model.apply(
            p, x, rngs={"clustering": key}, output_cluster_indices=True
        )["cluster_indices"]

    per_layer = fwd(params, pix, jax.random.PRNGKey(1))
    n = per_layer[0].shape[1]
    c = cfg.max_clusters
    prev = None
    for li, ci in enumerate(per_layer):
        ci = np.asarray(ci)
        if prev is not None and (ci == prev).all():
            continue
        prev = ci
        fracs = []
        print(f"-- epoch entering layer {li}:")
        for b in range(ci.shape[0]):
            sizes = np.bincount(ci[b], minlength=c)
            nz = sizes[sizes > 0]
            f = live_fraction(np.sort(sizes)[::-1], n)
            fracs.append(f)
            print(
                f"  img{b}: k={len(nz):2d} sizes={np.sort(nz)[::-1].tolist()}"
                f" live={f:.3f}"
            )
        print(f"  mean live fraction: {np.mean(fracs):.3f}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
