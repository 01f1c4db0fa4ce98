"""Shared-Nyström-anchor clustering fast path (r3, VERDICT item 3).

`ncut_shared` / `SpectralClusteringConfig(shared_anchors=True)` replace
the per-parent anchor draw with one global pool + per-parent compact
gather (ops/ncut.py::ncut_shared).  This is a documented, config-gated
deviation from the reference's independent per-parent sampling
(`modeling_spectral.py:85-90`); these tests pin the semantics it must
preserve: identical partitions on separated data, per-parent spectra,
and mask discipline.
"""

import numpy as np

import jax
import jax.numpy as jnp

from msvit_tpu.models.clustering import SpectralClusteringConfig, spectral_cluster
from msvit_tpu.ops.ncut import ncut, ncut_shared


def _blob_tokens(seed, n_per, d, centers_scale=10.0, n_blobs=4):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_blobs, d)) * centers_scale
    x = (centers[:, None, :] + rng.standard_normal((n_blobs, n_per, d)) * 0.3)
    return jnp.asarray(x.reshape(-1, d), jnp.float32)


def test_ncut_shared_matches_per_parent_spectra():
    """Eigenvalues per parent agree with independent per-parent ncut on
    separated blobs (parent 0 = blobs {0,1}, parent 1 = blobs {2,3}).

    Cosine affinity: its scale is data-independent, so the spectra are
    comparable across the two sampling bases.  (rbf normalizes by the
    mean sampled squared distance, which legitimately differs between a
    parent's own Gumbel draw and its shared-pool slice — the rbf-mode
    guarantee is the partition test below, not eigenvalue equality.)"""
    x = _blob_tokens(0, n_per=40, d=8)  # [160, 8]
    parent = jnp.repeat(jnp.arange(2), 80)
    member = parent[None, :] == jnp.arange(4)[:, None]  # [C=4, 160]

    vecs, vals = ncut_shared(
        x, num_eig=4, key=jax.random.PRNGKey(0), member=member,
        num_sample=128, anchors_per_parent=64, distance="cosine",
    )
    assert vecs.shape == (4, 160, 4) and vals.shape == (4, 4)

    for c in range(2):
        _, vals_ref = ncut(
            x, num_eig=4, key=jax.random.PRNGKey(c + 1),
            num_sample=128, mask=member[c], distance="cosine",
        )
        # each parent holds two separated blobs → two dominant eigenvalues
        np.testing.assert_allclose(
            np.asarray(vals[c][:2]), np.asarray(vals_ref[:2]), atol=0.05
        )
        assert float(vals[c][1]) > float(vals[c][2]) + 0.1
        # second eigenvector separates the parent's two blobs
        mem = np.asarray(member[c])
        v1 = np.asarray(vecs[c][:, 1])[mem]
        assert (v1[:40].mean() > 0) != (v1[40:].mean() > 0)

    # empty parents produce finite output (padded cluster axis discipline)
    assert bool(jnp.isfinite(vecs).all()) and bool(jnp.isfinite(vals).all())


def test_spectral_cluster_shared_same_partition():
    """shared_anchors=True yields the same token partition as the
    per-parent reference mode on well-separated blobs."""
    x = _blob_tokens(1, n_per=30, d=8)[None]  # [1, 120, 8]
    parents = jnp.repeat(jnp.arange(2), 60)[None]  # 2 parents × 2 blobs

    base = dict(
        ncut_dim=4, num_sample=128, max_clusters=8,
        eigenvalue_threshold=0.2,
    )
    cfg_ref = SpectralClusteringConfig(**base)
    cfg_sh = SpectralClusteringConfig(
        **base, shared_anchors=True, anchors_per_parent=64
    )
    child_ref, n_ref = spectral_cluster(cfg_ref, parents, x, jax.random.PRNGKey(0))
    child_sh, n_sh = spectral_cluster(cfg_sh, parents, x, jax.random.PRNGKey(0))

    np.testing.assert_array_equal(np.asarray(n_ref), np.asarray(n_sh))

    # same partition up to label permutation: co-membership matrices equal
    def comem(c):
        c = np.asarray(c).reshape(-1)
        return c[:, None] == c[None, :]

    np.testing.assert_array_equal(comem(child_ref), comem(child_sh))


def test_ncut_shared_anchor_cap_subsamples():
    """A parent owning more pool anchors than anchors_per_parent is
    subsampled, not broken: spectra still resolve its blob structure."""
    x = _blob_tokens(2, n_per=60, d=8, n_blobs=2)  # [120, 8] — one parent
    member = jnp.ones((1, 120), bool)
    _, vals = ncut_shared(
        x, num_eig=4, key=jax.random.PRNGKey(3), member=member,
        num_sample=120, anchors_per_parent=32,
    )
    assert float(vals[0, 1]) > float(vals[0, 2]) + 0.1
