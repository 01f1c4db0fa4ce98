"""Spectral-clustering debug paths (reference `modeling_spectral.py`
`visualize`, lines 98-165 and 289-316):

* `kway_ncut` (Yu–Shi discretization, replaces `ncut_pytorch.kway_ncut`)
  must recover axis-aligned clusters up to permutation and return an
  orthogonal rotation.
* `kmeans(init_centers=...)` (the reference's centroid-seeded KMeans,
  `modeling_spectral.py:131-135`) must keep well-separated seeds.
* `spectral_debug_labels` must produce every label row the debug figure
  draws, consistent with each other on clean two-blob data.
* `visualize_spectral_debug` end-to-end figure smoke (Agg).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msvit_tpu.ops.kmeans import kmeans
from msvit_tpu.ops.ncut import kway_ncut


def _axis_blobs(rng, k=3, per=40, noise=0.08):
    g = np.repeat(np.arange(k), per)
    x = 3.0 * np.eye(k, dtype=np.float32)[g]
    x += noise * rng.standard_normal(x.shape).astype(np.float32)
    return x, g


def _purity(pred, true):
    """Best-permutation agreement via per-cluster majority vote."""
    pred, true = np.asarray(pred), np.asarray(true)
    total = 0
    for c in np.unique(pred):
        _, counts = np.unique(true[pred == c], return_counts=True)
        total += counts.max()
    return total / len(true)


def test_kway_ncut_recovers_axis_clusters():
    rng = np.random.default_rng(0)
    x, g = _axis_blobs(rng)
    # random orthogonal rotation hides the axis alignment
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    onehot, r = kway_ncut(jnp.asarray(x @ q.astype(np.float32)))
    onehot, r = np.asarray(onehot), np.asarray(r)
    assert onehot.shape == (len(g), 3)
    np.testing.assert_allclose(onehot.sum(axis=1), 1.0)
    # rotation is orthogonal
    np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-5)
    assert _purity(onehot.argmax(axis=1), g) == 1.0


def test_kway_ncut_rotation_extends_to_new_rows():
    rng = np.random.default_rng(1)
    x, g = _axis_blobs(rng, per=60)
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    xq = (x @ q).astype(np.float32)
    fit, held = xq[::2], xq[1::2]
    _, r = kway_ncut(jnp.asarray(fit))
    held_labels = np.asarray(jnp.argmax(jnp.asarray(held) @ r, axis=1))
    assert _purity(held_labels, g[1::2]) == 1.0


def test_kmeans_init_centers_respected():
    rng = np.random.default_rng(2)
    x = np.concatenate(
        [c + 0.05 * rng.standard_normal((30, 2)) for c in ((0, 0), (5, 5))]
    ).astype(np.float32)
    centers0 = jnp.asarray([[0.0, 0.0], [5.0, 5.0]], jnp.float32)
    labels, centers = kmeans(
        jnp.asarray(x), k=2, key=jax.random.PRNGKey(0), init_centers=centers0
    )
    labels = np.asarray(labels)
    # seeded order is preserved: cluster 0 stays at the origin blob
    assert (labels[:30] == 0).all() and (labels[30:] == 1).all()
    np.testing.assert_allclose(
        np.asarray(centers), np.asarray(centers0), atol=0.1
    )


def test_spectral_debug_labels_two_blobs():
    from msvit_tpu.models.clustering import spectral_debug_labels

    rng = np.random.default_rng(3)
    # cosine-separable blobs (the debug path row-normalizes, so both
    # clusters must live away from the origin in distinct directions)
    c1, c2 = 4.0 * np.eye(6)[0], 4.0 * np.eye(6)[1]
    x = np.concatenate(
        [c + 0.3 * rng.standard_normal((100, 6)) for c in (c1, c2)]
    ).astype(np.float32)
    g = np.repeat(np.arange(2), 100)
    out = spectral_debug_labels(
        jnp.asarray(x),
        jax.random.PRNGKey(0),
        cluster_size_threshold=0.05,
        min_samples=8,
    )
    assert list(out) == [
        "hdbscan",
        "km_boosted_spectral",
        "km_spectral",
        "aa_boosted_spectral",
        "aa_spectral",
    ]
    hdb = out["hdbscan"]
    assert hdb.max() + 1 == 2
    clustered = hdb >= 0
    assert clustered.mean() > 0.75  # HDBSCAN marks border points noise
    assert _purity(hdb[clustered], g[clustered]) > 0.99
    for name in ("km_boosted_spectral", "km_spectral", "aa_spectral"):
        lab = out[name]
        assert lab.shape == (200,)
        assert _purity(lab, g) > 0.95, name


def test_visualize_spectral_debug_smoke(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from msvit_tpu.viz import visualize_spectral_debug

    rng = np.random.default_rng(4)
    bsz, h, w = 2, 8, 8
    g = rng.integers(0, 2, size=(bsz * h * w,))
    x = (3.0 * np.eye(2)[g] @ rng.standard_normal((2, 4))).astype(np.float32)
    x += 0.2 * rng.standard_normal(x.shape).astype(np.float32)
    figs, labels = visualize_spectral_debug(
        x.reshape(bsz, h * w, 4),
        grid=(h, w),
        images=2,
        cluster_size_threshold=0.05,
        min_samples=8,
        tsne_iters=60,
        show=False,
        save_prefix=str(tmp_path / "dbg"),
    )
    assert len(figs) == 1 + 1 + 2  # eig strip + label grid + t-SNE per image
    assert (tmp_path / "dbg_eigs.png").exists()
    assert (tmp_path / "dbg_labels.png").exists()
    assert (tmp_path / "dbg_tsne0.png").exists()
    assert (tmp_path / "dbg_tsne1.png").exists()
    assert "hdbscan" in labels
