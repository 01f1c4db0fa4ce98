"""HDBSCAN op vs sklearn (the reference's cuML HDBSCAN debug paths,
`modeling_spectral.py:24-39,96-130`).

* MST: total weight of the device Prim tree over mutual reachability ==
  scipy's MST on the same (numpy-built) mutual-reachability matrix.
* labels + probabilities: exact match vs `sklearn.cluster.HDBSCAN`
  (same algorithm; sklearn orders labels by condensed-tree cluster id,
  which we mirror) across blob and blob+noise datasets.
* HDBNCUT sampler: draws only clustered (non-noise) points.
"""

import numpy as np
import pytest

from msvit_tpu.ops.hdbscan import (
    hdbncut_sample_indices,
    hdbscan,
    labels_from_mst,
    mutual_reachability_mst,
)

sklearn_cluster = pytest.importorskip("sklearn.cluster")


def _blobs(rng, centers, n_per, scale=0.4, d=2):
    pts = [c + scale * rng.standard_normal((n_per, d)) for c in centers]
    return np.concatenate(pts, axis=0).astype(np.float32)


def _mr_numpy(x, min_samples):
    d = np.sqrt(
        np.maximum(
            np.sum(x**2, 1)[:, None] + np.sum(x**2, 1)[None] - 2 * x @ x.T, 0
        )
    )
    np.fill_diagonal(d, 0.0)
    core = np.sort(d, axis=1)[:, min_samples - 1]
    return np.maximum(d, np.maximum(core[:, None], core[None, :]))


def test_mst_matches_scipy():
    from scipy.sparse.csgraph import minimum_spanning_tree

    rng = np.random.default_rng(0)
    x = rng.standard_normal((80, 5)).astype(np.float32)
    src, dst, w = mutual_reachability_mst(x, min_samples=5)
    mr = _mr_numpy(x.astype(np.float64), 5)
    ours = float(np.sum(np.asarray(w, np.float64)))
    theirs = float(minimum_spanning_tree(mr).sum())
    assert ours == pytest.approx(theirs, rel=1e-5)
    # a spanning tree: n-1 edges touching all n nodes
    touched = set(np.asarray(src)) | set(np.asarray(dst))
    assert touched == set(range(80))


@pytest.mark.parametrize(
    "min_cluster_size,min_samples", [(20, None), (15, 5), (10, 10)]
)
def test_labels_match_sklearn_blobs(min_cluster_size, min_samples):
    rng = np.random.default_rng(1)
    x = _blobs(rng, [np.array([0, 0]), np.array([6, 0]), np.array([0, 6])], 100)
    ours = hdbscan(x, min_cluster_size, min_samples)
    ref = sklearn_cluster.HDBSCAN(
        min_cluster_size=min_cluster_size, min_samples=min_samples
    ).fit(np.asarray(x, np.float64))
    np.testing.assert_array_equal(ours.labels, ref.labels_)
    np.testing.assert_allclose(ours.probabilities, ref.probabilities_, rtol=5e-3, atol=5e-3)


def test_labels_with_background_noise():
    rng = np.random.default_rng(2)
    blobs = _blobs(rng, [np.array([0, 0]), np.array([8, 8])], 120, scale=0.3)
    noise = rng.uniform(-4, 12, size=(60, 2)).astype(np.float32)
    x = np.concatenate([blobs, noise], axis=0)
    ours = hdbscan(x, min_cluster_size=25)
    ref = sklearn_cluster.HDBSCAN(min_cluster_size=25).fit(np.asarray(x, np.float64))
    np.testing.assert_array_equal(ours.labels, ref.labels_)
    np.testing.assert_allclose(ours.probabilities, ref.probabilities_, rtol=5e-3, atol=5e-3)
    assert (ours.labels == -1).any()  # the uniform background yields noise
    assert ours.labels.max() >= 1


def test_labels_from_mst_is_pure_host():
    # tiny handmade tree: two 3-point clumps joined by a long edge
    src = np.array([0, 1, 3, 4, 2])
    dst = np.array([1, 2, 4, 5, 3])
    w = np.array([1.0, 1.0, 1.0, 1.0, 10.0])
    res = labels_from_mst(src, dst, w, n=6, min_cluster_size=3)
    assert set(res.labels[:3]) == {res.labels[0]} and res.labels[0] != -1
    assert set(res.labels[3:]) == {res.labels[3]} and res.labels[3] != -1
    assert res.labels[0] != res.labels[3]


def test_hdbncut_sampler_excludes_noise():
    import jax

    rng = np.random.default_rng(3)
    blobs = _blobs(rng, [np.zeros(8), np.full(8, 10.0)], 150, scale=0.3, d=8)
    noise = rng.uniform(-5, 15, size=(40, 8)).astype(np.float32)
    x = np.concatenate([blobs, noise], axis=0)
    idx = hdbncut_sample_indices(
        x, num_sample=64, key=jax.random.PRNGKey(0),
        cluster_size_threshold=0.2, min_samples=20,
    )
    assert idx.shape == (64,)
    assert len(set(idx.tolist())) == 64
    labels, _ = hdbscan(
        np.asarray(x), min_cluster_size=max(int(0.2 * len(x)), 2), min_samples=20
    )
    # PCA of an 8-dim dataset at q=8 is lossless, so the sampler's labels
    # match direct labels: every drawn index is a clustered point
    assert (labels[idx] != -1).all()
