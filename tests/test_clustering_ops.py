"""Clustering-op unit tests (SURVEY §4 (a)): NCut vs dense eigh on small
matrices, KMeans determinism/correctness, FPS determinism."""

import numpy as np

import jax
import jax.numpy as jnp

from msvit_tpu.ops.fps import farthest_point_sampling
from msvit_tpu.ops.kmeans import kmeans
from msvit_tpu.ops.ncut import ncut


def _two_blobs(n_per=40, d=8, sep=6.0, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n_per, d)) + sep
    b = rng.standard_normal((n_per, d)) - sep
    return jnp.asarray(np.concatenate([a, b]), jnp.float32)


def test_ncut_separates_blobs():
    x = _two_blobs()
    # full sampling (num_sample >= n) → exact spectral embedding
    vecs, vals = ncut(x, num_eig=4, key=jax.random.PRNGKey(0), num_sample=128)
    assert vecs.shape == (80, 4)
    # leading eigenvalue of the normalized affinity ≈ 1
    assert 0.9 < float(vals[0]) <= 1.0 + 1e-5
    # second eigenvector separates the blobs
    v1 = np.asarray(vecs[:, 1])
    assert (v1[:40].mean() > 0) != (v1[40:].mean() > 0)
    # two dominant eigenvalues, sharp drop after (block structure)
    assert float(vals[1]) > float(vals[2]) + 0.1


def test_ncut_nystrom_close_to_full():
    x = _two_blobs(n_per=100)
    k = jax.random.PRNGKey(1)
    _, vals_full = ncut(x, num_eig=4, key=k, num_sample=256)
    _, vals_nys = ncut(x, num_eig=4, key=k, num_sample=64)
    np.testing.assert_allclose(
        np.asarray(vals_full[:2]), np.asarray(vals_nys[:2]), atol=0.1
    )


def test_ncut_mask_restricts_members():
    x = _two_blobs()
    mask = jnp.arange(80) < 40  # only blob A
    vecs, vals = ncut(
        x, num_eig=3, key=jax.random.PRNGKey(0), num_sample=64, mask=mask
    )
    # a single connected blob: one dominant eigenvalue, others much smaller
    assert float(vals[0]) > 0.9
    assert float(vals[1]) < 0.5
    assert bool(jnp.isfinite(vecs).all())


def test_kmeans_two_blobs():
    x = _two_blobs()
    labels, centers = kmeans(x, k=2, key=jax.random.PRNGKey(0))
    la = np.asarray(labels[:40])
    lb = np.asarray(labels[40:])
    assert (la == la[0]).all() and (lb == lb[0]).all() and la[0] != lb[0]
    # centers near blob means
    got = np.sort(np.asarray(centers)[:, 0])
    np.testing.assert_allclose(got, [-6.0, 6.0], atol=1.0)


def test_kmeans_active_centers():
    x = _two_blobs()
    active = jnp.asarray([True, True, False, False])
    labels, _ = kmeans(x, k=4, key=jax.random.PRNGKey(0), active=active)
    assert int(labels.max()) <= 1  # inactive centers never win


def test_kmeans_mask():
    x = _two_blobs()
    mask = jnp.arange(80) < 40
    labels, centers = kmeans(x, k=2, key=jax.random.PRNGKey(2), mask=mask)
    # both centers end up inside blob A (only members update centers)
    np.testing.assert_allclose(np.asarray(centers)[:, 0], 6.0, atol=2.0)


def test_fps_spreads_and_respects_mask():
    x = jnp.asarray(
        [[0.0, 0.0], [0.1, 0.0], [10.0, 0.0], [10.1, 0.0], [5.0, 8.0]],
        jnp.float32,
    )
    idx = farthest_point_sampling(x, 3)
    chosen = set(np.asarray(idx).tolist())
    # picks one point from each far-apart group
    assert len(chosen & {0, 1}) >= 1
    assert len(chosen & {2, 3}) >= 1
    assert 4 in chosen

    mask = jnp.asarray([True, True, True, True, False])
    idx = farthest_point_sampling(x, 3, mask=mask)
    assert 4 not in set(np.asarray(idx).tolist())


def test_ncut_subspace_matches_eigh():
    """The all-matmul subspace eigensolver (ops/ncut.py::_topk_eig_subspace,
    the production eig_method for spectral clustering) agrees with the
    dense eigh path on eigenvalues and on the spectral embedding geometry."""
    x = _two_blobs(n_per=100)
    k = jax.random.PRNGKey(2)
    vecs_e, vals_e = ncut(x, num_eig=4, key=k, num_sample=128, eig_method="eigh")
    vecs_s, vals_s = ncut(
        x, num_eig=4, key=k, num_sample=128, eig_method="subspace", eig_iters=12
    )
    np.testing.assert_allclose(
        np.asarray(vals_e[:3]), np.asarray(vals_s[:3]), atol=0.02
    )
    # eigenvectors agree up to sign (compare absolute cosine per column)
    for j in range(2):
        a = np.asarray(vecs_e[:, j])
        b = np.asarray(vecs_s[:, j])
        cos = abs(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert cos > 0.99, (j, cos)
    # blob separation survives
    v1 = np.asarray(vecs_s[:, 1])
    assert (v1[:100].mean() > 0) != (v1[100:].mean() > 0)


def test_blocked_fps_valid_and_spread():
    """Blocked FPS returns k distinct in-bounds indices and is reasonably
    spread (min pairwise distance within 4x of exact FPS on clustered
    data); groups=1 falls back to exact."""
    from msvit_tpu.ops.fps import (
        farthest_point_sampling,
        farthest_point_sampling_blocked,
    )

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(16, 1, 4)) * 10.0
    x = jnp.asarray(
        (centers + rng.normal(size=(16, 25, 4))).reshape(-1, 4), jnp.float32
    )
    k = 32  # the fps_cluster regime: k/groups >= 4 picks per group
    key = jax.random.PRNGKey(3)
    idx_b = farthest_point_sampling_blocked(x, k, key=key, groups=8)
    assert idx_b.shape == (k,)
    assert len(set(np.asarray(idx_b).tolist())) == k
    assert int(jnp.max(idx_b)) < x.shape[0]

    # candidate quality = cluster COVERAGE (the spatial partition keeps
    # groups complementary; the downstream scoring step dedups): 32
    # picks over 16 well-separated clusters should hit most of them
    cluster_of = np.repeat(np.arange(16), 25)
    covered = len(set(cluster_of[np.asarray(idx_b)].tolist()))
    assert covered >= 12, covered

    # groups=1 (or non-dividing) falls back to the exact serial FPS
    idx_e = farthest_point_sampling_blocked(x, 16, key=key, groups=1)
    assert np.array_equal(
        np.asarray(idx_e), np.asarray(farthest_point_sampling(x, 16, key=key))
    )
