"""Clustering variants (reference `model/clustering/`).

* spectral — the production path (`modeling_spectral.py:50-94`): per
  parent cluster, NCut-embed the member tokens, count children by
  thresholding the eigenvalues, KMeans the top eigenvectors.  Under XLA
  the per-parent loop is a static loop over `max_clusters` with member
  masks, and the data-dependent child count becomes an active-center
  mask in KMeans (SURVEY §7.6 "padded to static max_clusters").
* fps — farthest-point-sampling variant (`modeling_fps.py:13-104`,
  incomplete upstream: missing `utils.fps`, debug `raise` — implemented
  here per its evident intent).
* axis-align — gumbel-softmax one-hot over NCut axes
  (`modeling_axisalign.py:16-37`, unfinished/unregistered upstream;
  provided as an experimental variant).

Divergences from the reference (documented per SURVEY §7):
* cuML KMeans → our jittable KMeans; the cuML-HDBSCAN debug paths
  (HDBNCUT anchor filter, `visualize` labelling) are served by
  `msvit_tpu.ops.hdbscan` (device MST + host extraction,
  sklearn-golden-tested) — nothing in the production forward uses them,
  exactly as upstream.
* the reference's `n_children == 0` branch assigns ids that collide with
  the next parent's children (`modeling_spectral.py:91-94` doesn't
  advance the counter); we clamp to ≥1 child (the evident intent).
* Nyström sample count defaults lower (1024 vs 10000) — TPU eigh budget.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from msvit_tpu.ops.fps import farthest_point_sampling_blocked
from msvit_tpu.ops.kmeans import kmeans
from msvit_tpu.ops.linalg import pca_lowrank
from msvit_tpu.ops.ncut import ncut, ncut_shared


@dataclasses.dataclass(frozen=True)
class ClusteringConfig:
    model_type: str = ""
    ncut_dim: int = 8
    num_sample: int = 1024
    # static upper bound on total clusters (the padded cluster axis)
    max_clusters: int = 16
    # True (reference semantics): tokens of every batch element are pooled
    # per parent cluster (`modeling_spectral.py:85-90` gathers across the
    # batch) — cluster ids are global.  False: cluster each image
    # independently (vmapped) — the sane mode for batched inference.
    pool_batch: bool = True


@dataclasses.dataclass(frozen=True)
class SpectralClusteringConfig(ClusteringConfig):
    model_type: str = "spectral"
    ncut_dist: str = "rbf"  # "rbf" | "cosine"
    eigenvalue_threshold: float = 0.1
    cluster_size_threshold: float = 0.0  # kept for config parity (unused)
    affinity_focal_gamma: float = 3.0
    kmeans_iters: int = 16
    # "subspace": randomized subspace iteration (all-matmul, batches over
    # the cluster axis on the MXU — ops/ncut.py) — the production default.
    # "eigh": exact dense eigensolve (QDWH on TPU: accurate but orders of
    # magnitude slower when batched; use for parity checks).
    eig_method: str = "subspace"
    eig_iters: int = 12
    # MXU input dtype for the NCut affinity cross-products; "" = derive
    # from eig_method (float32 for the exact "eigh" parity path, bfloat16
    # for the production "subspace" path — see ops/ncut.py::_cross)
    matmul_dtype: str = ""
    # r3 fast path (off by default — semantics deviation): ONE global
    # Nyström anchor pool shared across parents instead of an independent
    # num_sample draw per parent; each parent gets its ≤anchors_per_parent
    # in-pool anchors (compact gather), shrinking the vmapped affinity and
    # eigensolve ~(num_sample/anchors_per_parent)² ×.  See
    # ops/ncut.py::ncut_shared.
    shared_anchors: bool = False
    anchors_per_parent: int = 256
    # Per-parent anchor budget for clustering calls that can see MORE than
    # one parent (`max_parents > 1`, i.e. every call after the first
    # split).  0 = use `num_sample` everywhere.  Later calls have many
    # small parents, so a 1024-anchor budget is mostly zero padding; a
    # smaller budget is EXACT whenever a parent owns ≤ late_num_sample
    # member tokens (all members still become anchors — only the padding
    # shrinks), and otherwise is the same Nyström-subsample deviation
    # class as `num_sample` itself (the reference samples
    # min(10000, members), `modeling_spectral.py:54-69`).
    late_num_sample: int = 0


@dataclasses.dataclass(frozen=True)
class FPSClusteringConfig(ClusteringConfig):
    model_type: str = "fps"
    fps_dim: int = 8
    fps_sample1: int = 64
    fps_sample2: int = 8
    fps_supersample2: int = 32
    cosine_similarity_threshold: float = 0.7
    ncut_dist: str = "cosine"
    affinity_focal_gamma: float = 3.0
    eig_method: str = "subspace"  # see SpectralClusteringConfig
    eig_iters: int = 12
    matmul_dtype: str = ""  # see SpectralClusteringConfig


@dataclasses.dataclass(frozen=True)
class AxisAlignClusteringConfig(ClusteringConfig):
    model_type: str = "axis"
    temperature: float = 1.0
    ncut_dist: str = "cosine"
    affinity_focal_gamma: float = 3.0


def _ncut_matmul_dtype(config: ClusteringConfig) -> str:
    """Affinity MXU dtype: explicit config wins; otherwise f32 whenever the
    exact `eigh` path (documented as the parity mode) is selected, so f32
    parity checks don't silently run bf16 affinities."""
    md = getattr(config, "matmul_dtype", "")
    if md:
        return md
    exact = getattr(config, "eig_method", "subspace") == "eigh"
    return "float32" if exact else "bfloat16"


def _spectral_single(
    config: SpectralClusteringConfig,
    flat_parent: jnp.ndarray,  # [M] int
    flat_x: jnp.ndarray,  # [M, D]
    key: jax.Array,
    max_parents: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Core per-parent NCut→threshold→KMeans over one token set; returns
    (child ids [M], n_children [C_max]).

    The reference loops over parents in Python, each iteration running its
    own NCut + KMeans (`modeling_spectral.py:72-94`).  Round 1 kept that
    loop (serial `lax.cond`-guarded eigensolves); here every per-parent
    stage is **batched over the cluster axis** instead — one vmapped NCut
    (batched [C, m, m] eigh instead of C sequential ones) and one vmapped
    KMeans.  The only genuinely sequential piece of the reference
    semantics, the child-count budget clamp (each parent's child count is
    clipped to the slots still free), is a scalar `lax.scan` over C.

    `max_parents` is a STATIC upper bound on the number of distinct parent
    ids present (ids must be < max_parents); the per-parent axis of every
    batched stage shrinks from `max_clusters` to this bound.  EXACT: the
    per-parent rng keys are sliced from the same `2·C_max` split, and
    parent slots beyond the actual ids are empty today (zero affinity,
    zero child count, no tokens) — so results are identical to the
    unbounded call whenever the bound holds.  The multistate backbone
    threads the bound statically: the first clustering call always sees
    exactly 1 parent, the second at most `ncut_dim` (each parent yields
    ≤ ncut_dim children), etc.
    """
    c_max = config.max_clusters
    c_bound = c_max if max_parents is None else max(1, min(max_parents, c_max))
    flat_x = flat_x.astype(jnp.float32)
    n_tokens = flat_x.shape[0]

    member = flat_parent[None, :] == jnp.arange(c_bound)[:, None]  # [Cb, M]
    has = jnp.any(member, axis=1)  # [Cb]
    keys = jax.random.split(key, 2 * c_max)
    k_ncut, k_km = keys[:c_bound], keys[c_max : c_max + c_bound]

    num_sample = config.num_sample
    if c_bound > 1 and config.late_num_sample:
        num_sample = config.late_num_sample

    if config.shared_anchors:
        vecs, vals = ncut_shared(
            flat_x,
            num_eig=config.ncut_dim,
            key=k_ncut[0],
            member=member,
            num_sample=num_sample,
            anchors_per_parent=config.anchors_per_parent,
            distance=config.ncut_dist,
            gamma=config.affinity_focal_gamma,
            eig_method=config.eig_method,
            eig_iters=config.eig_iters,
            matmul_dtype=_ncut_matmul_dtype(config),
        )  # [C, M, e], [C, e]
    else:
        vecs, vals = jax.vmap(
            lambda m, k: ncut(
                flat_x,
                num_eig=config.ncut_dim,
                key=k,
                num_sample=num_sample,
                distance=config.ncut_dist,
                gamma=config.affinity_focal_gamma,
                mask=m,
                eig_method=config.eig_method,
                eig_iters=config.eig_iters,
                matmul_dtype=_ncut_matmul_dtype(config),
            )
        )(member, k_ncut)  # [C, M, e], [C, e]

    # children count = #(eigenvalues above threshold), clamped to ≥1 and
    # to the remaining slot budget (`modeling_spectral.py:87`); empty
    # parent slots contribute 0 children
    k_raw = jnp.sum(vals > config.eigenvalue_threshold, axis=-1).astype(jnp.int32)

    def clamp_step(cum, inp):
        k_raw_p, has_p = inp
        k_p = jnp.where(
            has_p, jnp.clip(k_raw_p, 1, jnp.maximum(c_max - cum, 1)), 0
        )
        return cum + k_p, (k_p, cum)

    _, (n_children, cums) = jax.lax.scan(
        clamp_step, jnp.asarray(0, jnp.int32), (k_raw, has)
    )

    # KMeans on the top-k_p eigenvectors: zero inactive columns (the
    # reference slices `ncut_x[:, :n_child]`), mask inactive centers
    col_active = jnp.arange(config.ncut_dim)[None, :] < n_children[:, None]
    sub = vecs * col_active[:, None, :]
    labels, _ = jax.vmap(
        lambda s, k, a, m: kmeans(
            s,
            k=config.ncut_dim,
            key=k,
            iters=config.kmeans_iters,
            active=a,
            mask=m,
        )
    )(sub, k_km, col_active, member)  # [C, M]

    # parents partition the tokens, so a masked sum assembles global ids
    result = jnp.sum(
        jnp.where(member, cums[:, None] + labels, 0), axis=0
    ).astype(jnp.int32)
    # n_children stays [C_max] regardless of the bound (downstream shapes
    # are static); slots beyond the bound are empty by construction
    n_children = jnp.pad(n_children, (0, c_max - c_bound))
    return jnp.clip(result, 0, c_max - 1), n_children


def spectral_cluster(
    config: SpectralClusteringConfig,
    parent_indices: jnp.ndarray,  # [B, N] int
    x: jnp.ndarray,  # [B, N, D]
    key: jax.Array,
    max_parents: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference `SpectralClustering.forward` (`modeling_spectral.py:72-94`)
    with static shapes.  Returns (child_indices [B,N], n_children) where
    n_children is [C_max] in pooled mode (reference semantics) or [B,C_max]
    in per-image mode (config.pool_batch=False).  `max_parents` is an
    optional STATIC bound on the distinct parent ids present — see
    `_spectral_single` (exact, shrinks the padded per-parent axis)."""
    b, n = parent_indices.shape
    if config.pool_batch:
        result, n_children = _spectral_single(
            config,
            parent_indices.reshape(b * n),
            x.reshape(b * n, -1),
            key,
            max_parents=max_parents,
        )
        return result.reshape(b, n), n_children
    keys = jax.random.split(key, b)
    return jax.vmap(
        lambda pi, xi, ki: _spectral_single(
            config, pi, xi, ki, max_parents=max_parents
        )
    )(parent_indices, x, keys)


def _parent_majority(
    child_indices: jnp.ndarray,  # [B, N]
    parent_indices: jnp.ndarray,  # [B, N]
    c_max: int,
) -> jnp.ndarray:
    """n_children-style table for variants that ignore parents: attribute
    each child cluster to the parent owning most of its tokens, then count
    children per parent (needed for TX/RX duplication)."""
    child_oh = jax.nn.one_hot(child_indices.reshape(-1), c_max)  # [BN, C]
    parent_oh = jax.nn.one_hot(parent_indices.reshape(-1), c_max)
    votes = child_oh.T @ parent_oh  # [C_child, C_parent]
    occupied = jnp.sum(child_oh, axis=0) > 0
    parent_of = jnp.argmax(votes, axis=-1)
    counts = jax.nn.one_hot(parent_of, c_max).T @ occupied.astype(jnp.float32)
    return counts.astype(jnp.int32)


def _vmap_per_image(fn, config, parent_indices, x, key):
    """Per-image mode for variants written against pooled flat arrays:
    vmap the pooled implementation over singleton batches."""
    pooled = dataclasses.replace(config, pool_batch=True)
    keys = jax.random.split(key, parent_indices.shape[0])

    def one(pi, xi, ki):
        ci, nc = fn(pooled, pi[None], xi[None], ki)
        return ci[0], nc

    return jax.vmap(one)(parent_indices, x, keys)


def fps_cluster(
    config: FPSClusteringConfig,
    parent_indices: jnp.ndarray,
    x: jnp.ndarray,
    key: jax.Array,
    max_parents: Optional[int] = None,  # unused: fps clusters globally
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference `FPSClustering.forward` intent (`modeling_fps.py:28-60`):
    NCut-embed all tokens → PCA → FPS s1 candidates → cosine-similarity
    profiles → standardize → PCA → FPS supersample → score by #tokens
    above the similarity threshold → top-k s2 centers → assign tokens by
    argmax similarity."""
    b, n = parent_indices.shape
    if not config.pool_batch:
        return _vmap_per_image(fps_cluster, config, parent_indices, x, key)
    flat_x = x.reshape(b * n, -1).astype(jnp.float32)
    key, k_ncut, k_f1, k_f2 = jax.random.split(key, 4)

    ncut_x, _ = ncut(
        flat_x,
        num_eig=config.ncut_dim,
        key=k_ncut,
        num_sample=config.num_sample,
        distance=config.ncut_dist,
        gamma=config.affinity_focal_gamma,
        eig_method=config.eig_method,
        eig_iters=config.eig_iters,
        matmul_dtype=_ncut_matmul_dtype(config),
    )  # [BN, ncut_dim]

    pca_x, _, _ = pca_lowrank(ncut_x, config.fps_dim)
    # blocked (G-way parallel) FPS: these selections only seed
    # candidates that the cosine-score step filters, and exact FPS's
    # serial chain dominated the forward (ops/fps.py)
    s1_idx = farthest_point_sampling_blocked(
        pca_x, config.fps_sample1, key=k_f1
    )
    s1 = ncut_x[s1_idx]  # [s1, ncut_dim]

    def _norm(v):
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-8)

    sim = _norm(s1) @ _norm(ncut_x).T  # [s1, BN]
    sim_std = (sim - jnp.mean(sim, -1, keepdims=True)) / (
        jnp.std(sim, -1, keepdims=True) + 1e-8
    )
    s1_pca, _, _ = pca_lowrank(sim_std, config.fps_dim)
    ss2_idx = farthest_point_sampling_blocked(
        s1_pca, config.fps_supersample2, key=k_f2
    )
    ss2 = s1[ss2_idx]  # [ss2, ncut_dim]

    sim2 = _norm(ss2) @ _norm(ncut_x).T  # [ss2, BN]
    score = jnp.sum(sim2 > config.cosine_similarity_threshold, axis=-1)
    _, s2_idx = jax.lax.top_k(score, config.fps_sample2)
    child = jnp.argmax(sim2[s2_idx], axis=0).astype(jnp.int32)  # [BN]

    child_indices = child.reshape(b, n)
    n_children = _parent_majority(
        child_indices, parent_indices, config.max_clusters
    )
    return child_indices, n_children


def axis_align_cluster(
    config: AxisAlignClusteringConfig,
    parent_indices: jnp.ndarray,
    x: jnp.ndarray,
    key: jax.Array,
    max_parents: Optional[int] = None,  # unused: axis-align is global
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference `AxisAlignClustering.forward` (`modeling_axisalign.py:23-37`,
    unfinished upstream — it builds a gumbel one-hot over NCut axes and a
    token-token mask but returns nothing): the hard one-hot axis IS the
    cluster assignment, which induces exactly that mask."""
    b, n = parent_indices.shape
    if not config.pool_batch:
        return _vmap_per_image(
            axis_align_cluster, config, parent_indices, x, key
        )
    flat_x = x.reshape(b * n, -1).astype(jnp.float32)
    key, k_ncut, k_g = jax.random.split(key, 3)

    demeaned = flat_x - jnp.mean(flat_x, axis=0, keepdims=True)
    ncut_x, _ = ncut(
        demeaned,
        num_eig=config.ncut_dim,
        key=k_ncut,
        num_sample=config.num_sample,
        distance=config.ncut_dist,
        gamma=config.affinity_focal_gamma,
    )
    gumbel = jax.random.gumbel(k_g, ncut_x.shape)
    child = jnp.argmax(
        ncut_x / config.temperature + gumbel, axis=-1
    ).astype(jnp.int32)
    child_indices = child.reshape(b, n)
    n_children = _parent_majority(
        child_indices, parent_indices, config.max_clusters
    )
    return child_indices, n_children


CLUSTERING_CLASSES = {
    "spectral": spectral_cluster,
    "fps": fps_cluster,
    "axis": axis_align_cluster,
}


def max_children_bound(config: ClusteringConfig, max_parents: int) -> int:
    """Static upper bound on the total number of child clusters one
    clustering call can produce when at most `max_parents` distinct parent
    ids are present.  Lets the multistate backbone thread a growing static
    bound through its clustering calls (1 parent at the first call,
    ≤ bound(1) at the second, …) so each call's padded per-parent axis is
    as narrow as provably safe."""
    c = config.max_clusters
    if config.model_type == "spectral":
        # each parent yields ≤ ncut_dim children (child count = #eigvals
        # above threshold out of ncut_dim, clamped ≥1 — module above)
        return min(max_parents * config.ncut_dim, c)
    if config.model_type == "fps":
        return min(config.fps_sample2, c)  # global argmax over s2 centers
    if config.model_type == "axis":
        return min(config.ncut_dim, c)  # global argmax over NCut axes
    return c


def cluster(
    config: ClusteringConfig,
    parent_indices: jnp.ndarray,
    x: jnp.ndarray,
    key: jax.Array,
    max_parents: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch by config.model_type (reference `CLUSTERING_CLASSES`,
    `clustering/__init__.py:7-10`).  `max_parents` optionally bounds the
    distinct parent ids statically (see `_spectral_single`)."""
    return CLUSTERING_CLASSES[config.model_type](
        config, parent_indices, x, key, max_parents=max_parents
    )


def spectral_debug_labels(
    ncut_x: jnp.ndarray,  # [n, ncut_dim] NCut eigenvectors (pooled batch)
    key: jax.Array,
    cluster_size_threshold: float = 0.02,
    min_samples: int = 512,
    num_sample: int = 1024,
    kmeans_iters: int = 16,
):
    """The reference's `visualize` debug labellings
    (`modeling_spectral.py:98-145`): from the (batch-pooled) NCut
    eigenvectors, produce every label row that debug figure draws —

    * ``hdbscan``             — HDBSCAN on the iterative (cosine) NCut of
      the row-normalized eigenvectors; noise is −1.
    * ``km_boosted_spectral`` — nearest HDBSCAN-centroid assignment.
    * ``km_spectral``         — KMeans seeded with those centroids.
    * ``aa_boosted_spectral`` — Yu–Shi rotation fit on *clustered* rows,
      applied to all (`spectral_x @ R`).
    * ``aa_spectral``         — plain `kway_ncut` one-hot argmax.

    Host-side debug helper (the HDBSCAN tree extraction is host code),
    exactly like upstream — nothing in the production forward calls it.
    Returns an ``OrderedDict[str, np.ndarray[n]]``; only ``hdbscan`` is
    present when HDBSCAN finds no clusters (upstream returns early too).
    """
    from collections import OrderedDict

    import numpy as np

    from msvit_tpu.ops.hdbscan import hdbscan
    from msvit_tpu.ops.ncut import kway_ncut

    n, k_dim = ncut_x.shape
    normalized = ncut_x / (
        jnp.linalg.norm(ncut_x, axis=-1, keepdims=True) + 1e-8
    )
    k1, k2 = jax.random.split(key)
    spectral_x, _ = ncut(
        normalized,
        num_eig=k_dim,
        key=k1,
        num_sample=min(num_sample, n),
        distance="cosine",
        gamma=3.0,
    )
    res = hdbscan(
        spectral_x,
        min_cluster_size=max(int(cluster_size_threshold * n), 2),
        min_samples=min(min_samples, n),
    )
    labels = np.asarray(res.labels)
    out = OrderedDict(hdbscan=labels)
    n_child = int(labels.max()) + 1
    if n_child == 0:
        return out

    sx = np.asarray(spectral_x, np.float32)[:, :n_child]
    centers = np.stack(
        [sx[labels == c].mean(axis=0) for c in range(n_child)]
    )
    d2 = ((sx[:, None] - centers[None]) ** 2).sum(-1)  # [n, n_child]
    out["km_boosted_spectral"] = d2.argmin(axis=1)
    km_labels, _ = kmeans(
        jnp.asarray(sx),
        k=n_child,
        key=k2,
        iters=kmeans_iters,
        init_centers=jnp.asarray(centers),
    )
    out["km_spectral"] = np.asarray(km_labels)

    clustered = labels >= 0
    fit_rows = sx[clustered] if clustered.sum() >= n_child else sx
    _, rt = kway_ncut(jnp.asarray(fit_rows))
    out["aa_boosted_spectral"] = np.asarray(
        jnp.argmax(jnp.asarray(sx) @ rt, axis=1)
    )
    onehot, _ = kway_ncut(jnp.asarray(sx))
    out["aa_spectral"] = np.asarray(jnp.argmax(onehot, axis=1))
    return out
