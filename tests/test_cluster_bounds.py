"""Static parent-count bounds for clustering calls (module.py
`max_parents` / `max_children_bound`, threaded by the multistate
backbone): the bounded call must be EXACTLY the unbounded call whenever
the bound holds (same per-parent rng keys, empty slots contribute
nothing), and the late-call anchor budget must preserve partitions on
separated data."""

import numpy as np

import jax
import jax.numpy as jnp

from msvit_tpu.models.clustering import (
    AxisAlignClusteringConfig,
    FPSClusteringConfig,
    SpectralClusteringConfig,
    max_children_bound,
    spectral_cluster,
)


def _blob_tokens(seed, b, n, d, n_blobs, parents_of_blob=None):
    """Separated blobs; optionally assign each blob a parent id."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_blobs, d)) * 12.0
    labels = rng.integers(0, n_blobs, (b, n))
    x = centers[labels] + rng.standard_normal((b, n, d)) * 0.3
    if parents_of_blob is None:
        parents = np.zeros((b, n), np.int64)
    else:
        parents = np.asarray(parents_of_blob)[labels]
    return (
        jnp.asarray(x, jnp.float32),
        jnp.asarray(parents, jnp.int32),
        labels,
    )


def _cfg(**kw):
    base = dict(
        ncut_dim=4,
        num_sample=64,
        max_clusters=8,
        eigenvalue_threshold=0.2,
        ncut_dist="rbf",
    )
    base.update(kw)
    return SpectralClusteringConfig(**base)


def test_bounded_call_is_exact():
    """max_parents covering the actual ids ⇒ identical output to the
    unbounded call (keys are sliced from the same 2·C_max split and the
    dropped slots are empty)."""
    cfg = _cfg()
    # 4 blobs under 2 parents (ids 0 and 1)
    x, parents, _ = _blob_tokens(0, 2, 48, 8, 4, parents_of_blob=[0, 0, 1, 1])
    key = jax.random.PRNGKey(7)
    ci_full, nc_full = spectral_cluster(cfg, parents, x, key)
    for bound in (2, 3, 8):
        ci_b, nc_b = spectral_cluster(cfg, parents, x, key, max_parents=bound)
        np.testing.assert_array_equal(np.asarray(ci_full), np.asarray(ci_b))
        np.testing.assert_array_equal(np.asarray(nc_full), np.asarray(nc_b))
    assert nc_full.shape == (8,)  # padded to C_max regardless of bound


def test_bounded_single_parent_first_call():
    """The multistate backbone's first clustering call: all parents 0,
    bound 1 ⇒ exact."""
    cfg = _cfg()
    x, parents, _ = _blob_tokens(1, 2, 40, 8, 2)
    key = jax.random.PRNGKey(3)
    ci_full, nc_full = spectral_cluster(cfg, parents, x, key)
    ci_1, nc_1 = spectral_cluster(cfg, parents, x, key, max_parents=1)
    np.testing.assert_array_equal(np.asarray(ci_full), np.asarray(ci_1))
    np.testing.assert_array_equal(np.asarray(nc_full), np.asarray(nc_1))


def test_bounded_per_image_mode():
    cfg = _cfg(pool_batch=False)
    x, parents, _ = _blob_tokens(2, 3, 40, 8, 2)
    key = jax.random.PRNGKey(5)
    ci_full, nc_full = spectral_cluster(cfg, parents, x, key)
    ci_1, nc_1 = spectral_cluster(cfg, parents, x, key, max_parents=1)
    np.testing.assert_array_equal(np.asarray(ci_full), np.asarray(ci_1))
    np.testing.assert_array_equal(np.asarray(nc_full), np.asarray(nc_1))
    assert nc_1.shape == (3, 8)


def test_late_num_sample_partition():
    """A smaller late-call anchor budget still recovers the blob
    partition (exact when members ≤ budget: all members stay anchors)."""
    cfg = _cfg(late_num_sample=16)
    # two parents, each holding two well-separated blobs of ~12 tokens
    x, parents, labels = _blob_tokens(
        4, 2, 48, 8, 4, parents_of_blob=[0, 0, 1, 1]
    )
    ci, nc = spectral_cluster(
        cfg, parents, x, jax.random.PRNGKey(11), max_parents=2
    )
    ci = np.asarray(ci)
    # every true blob maps to exactly one child cluster id
    for b in range(2):
        for blob in range(4):
            sel = labels[b] == blob
            if sel.sum() == 0:
                continue
            assert len(np.unique(ci[b][sel])) == 1, (b, blob)
    # and distinct blobs get distinct ids within each image
    for b in range(2):
        ids = {np.unique(ci[b][labels[b] == blob])[0] for blob in range(4)}
        assert len(ids) == 4


def test_max_children_bound_values():
    sp = _cfg()
    assert max_children_bound(sp, 1) == 4  # ncut_dim
    assert max_children_bound(sp, 2) == 8  # clamped to max_clusters
    fps = FPSClusteringConfig(max_clusters=16, fps_sample2=8)
    assert max_children_bound(fps, 1) == 8
    ax = AxisAlignClusteringConfig(max_clusters=16, ncut_dim=8)
    assert max_children_bound(ax, 3) == 8
