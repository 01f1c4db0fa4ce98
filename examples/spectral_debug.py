"""Spectral-clustering debug inspection — the reference's
`SpectralClustering.visualize` workflow (`modeling_spectral.py:98-165`
label grids, `:289-316` t-SNE panels), end to end on synthetic
patch-token features:

  NCut-embed the tokens (device) → HDBSCAN / seeded-KMeans /
  axis-aligned (`kway_ncut`) label rows → device t-SNE RGB panels,
  figures written next to this script's output dir.

    python examples/spectral_debug.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import numpy as np

from msvit_tpu.ops.ncut import ncut
from msvit_tpu.viz import visualize_spectral_debug


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/msvit_spectral_debug"
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(0)

    # Synthetic "image tokens": 3 images of a 28x28 patch grid whose left /
    # right halves live in different feature clusters (stand-in for the
    # DINO features the reference inspects).
    bsz, h, w, d = 3, 28, 28, 64
    centers = 6.0 * rng.standard_normal((2, d)).astype(np.float32)
    half = (np.arange(w) >= w // 2).astype(int)  # [w] 0 left, 1 right
    g = np.broadcast_to(half, (bsz, h, w)).reshape(bsz, h * w)
    x = centers[g] + rng.standard_normal((bsz, h * w, d)).astype(np.float32)

    # The debug path starts from NCut eigenvectors of the pooled batch
    # (reference pools tokens across the batch per parent cluster).
    flat = jnp.asarray(x.reshape(bsz * h * w, d))
    ncut_x, eigvals = ncut(
        flat, num_eig=8, key=jax.random.PRNGKey(0), num_sample=1024
    )
    print("NCut eigenvalues:", np.round(np.asarray(eigvals), 4))

    figs, labels = visualize_spectral_debug(
        np.asarray(ncut_x).reshape(bsz, h * w, 8),
        grid=(h, w),
        images=3,
        cluster_size_threshold=0.02,
        min_samples=64,
        show=False,
        save_prefix=os.path.join(outdir, "spectral"),
    )
    for name, lab in labels.items():
        uniq = np.unique(lab)
        agree = (lab == g.reshape(-1)).mean()
        agree = max(agree, 1.0 - agree)  # label permutation
        print(f"{name:>22}: clusters={uniq.tolist()} half-split agreement={agree:.3f}")
    print(f"wrote {len(figs)} figures to {outdir}")


if __name__ == "__main__":
    main()
