"""HDBSCAN (debug clustering paths of the reference).

The reference uses cuML's `HDBSCAN(min_cluster_size, min_samples)` in two
debug-only paths (`model/clustering/modeling_spectral.py`):

* `HDBNCUT.fit_transform` (`modeling_spectral.py:24-39`) — filter tokens
  to the HDBSCAN-clustered subset before drawing NCut Nyström anchors
  (upstream computes `sampled_indices` and then passes the *original*
  `precomputed_sampled_indices` argument through — the filter result is
  unused; we implement the evident intent and actually use it);
* the nested `visualize` helper (`modeling_spectral.py:96-130`) — label
  NCut embeddings for inspection.

TPU-first split: the O(n²) distance work — pairwise distances, core
distances, and the mutual-reachability minimum spanning tree (dense
Prim) — runs on device with static shapes (`mutual_reachability_mst`).
The condensed-tree build + excess-of-mass cluster extraction is an
inherently sequential pointer-chasing pass over n-1 edges, so it runs
host-side in numpy (`labels_from_mst`), exactly like the reference's
cuML path (GPU MST, host tree extraction).  This is a debug/analysis
facility; nothing in the production forward depends on it.

Semantics match `sklearn.cluster.HDBSCAN` (same algorithm family as
cuML): core distance = distance to the `min_samples`-th nearest
neighbor **including the point itself**, mutual reachability
max(core_p, core_q, d_pq), single linkage over the MST, condensed tree
at `min_cluster_size`, excess-of-mass selection (no single-cluster
allowance), labels ordered by condensed-tree cluster id.  Golden-tested
against sklearn in `tests/test_hdbscan.py`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msvit_tpu.ops.linalg import pca_lowrank


@functools.partial(jax.jit, static_argnames=("min_samples",))
def mutual_reachability_mst(
    x: jnp.ndarray,  # [n, d]
    min_samples: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Minimum spanning tree of the mutual-reachability graph.

    Returns (src [n-1], dst [n-1], weight [n-1]) — the MST edges in the
    order dense Prim discovers them (not weight-sorted).

    All the O(n²) work is MXU/VPU friendly: one matmul for pairwise
    distances, a `top_k` for core distances, and n-1 Prim steps of
    length-n VPU argmin/minimum (a `lax.scan`; each step touches one
    dynamically-sliced row of the [n,n] matrix).
    """
    n = x.shape[0]
    x = x.astype(jnp.float32)
    sq = jnp.sum(x * x, axis=-1)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * (x @ x.T), 0.0)
    iota = jnp.arange(n)
    d = jnp.sqrt(d2).at[iota, iota].set(0.0)

    # k-th smallest per row, self (0.0) included — sklearn's convention.
    core = -jax.lax.top_k(-d, min_samples)[0][:, -1]
    mr = jnp.maximum(d, jnp.maximum(core[:, None], core[None, :]))
    inf = jnp.float32(jnp.inf)
    mr = mr.at[iota, iota].set(inf)

    def step(carry, _):
        min_d, min_src, in_tree = carry
        v = jnp.argmin(jnp.where(in_tree, inf, min_d)).astype(jnp.int32)
        edge = (min_src[v], v, min_d[v])
        in_tree = in_tree.at[v].set(True)
        row = mr[v]
        upd = row < min_d
        min_d = jnp.where(upd, row, min_d)
        min_src = jnp.where(upd, v, min_src)
        return (min_d, min_src, in_tree), edge

    init = (
        mr[0],
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), bool).at[0].set(True),
    )
    _, (src, dst, w) = jax.lax.scan(step, init, None, length=n - 1)
    return src, dst, w


class HDBSCANResult(NamedTuple):
    labels: np.ndarray  # [n] int, -1 = noise
    probabilities: np.ndarray  # [n] float in [0, 1]


def _single_linkage(src, dst, weight, n):
    """Dendrogram from MST edges (merge i creates node n+i): returns
    (children [n-1,2], dist [n-1], size [2n-1])."""
    order = np.argsort(weight, kind="stable")
    uf_parent = np.arange(n)

    def find(a):
        root = a
        while uf_parent[root] != root:
            root = uf_parent[root]
        while uf_parent[a] != root:  # path compression
            uf_parent[a], a = root, uf_parent[a]
        return root

    node_of = np.arange(n)  # union-find root -> dendrogram node id
    left = np.empty(n - 1, np.int64)
    right = np.empty(n - 1, np.int64)
    dist = np.empty(n - 1, np.float64)
    size = np.ones(2 * n - 1, np.int64)
    for i, e in enumerate(order):
        ra, rb = find(src[e]), find(dst[e])
        node = n + i
        left[i], right[i] = node_of[ra], node_of[rb]
        dist[i] = weight[e]
        size[node] = size[node_of[ra]] + size[node_of[rb]]
        uf_parent[rb] = ra
        node_of[ra] = node
    return np.stack([left, right], axis=1), dist, size


def _condense(children, dist, size, n, min_cluster_size):
    """Condensed tree (ids: points 0..n-1, root cluster = n): walk the
    dendrogram top-down; a split where both sides have ≥ min_cluster_size
    points creates two new clusters, otherwise the small side's points
    fall out of the current cluster at that node's lambda = 1/distance."""
    c_parent, c_child, c_lambda, c_size = [], [], [], []

    def leaves(node):
        out, stack = [], [node]
        while stack:
            v = stack.pop()
            if v < n:
                out.append(v)
            else:
                stack.extend(children[v - n])
        return out

    def lam(d):
        return 1.0 / d if d > 0.0 else np.inf

    relabel = {2 * n - 2: n}
    next_label = n + 1
    stack = [2 * n - 2]  # parents processed before children
    while stack:
        node = stack.pop()
        cl = relabel[node]
        l, r = children[node - n]
        lv = lam(dist[node - n])
        lsz = size[l] if l >= n else 1
        rsz = size[r] if r >= n else 1
        big = [(c, sz) for c, sz in ((l, lsz), (r, rsz)) if sz >= min_cluster_size]
        small = [(c, sz) for c, sz in ((l, lsz), (r, rsz)) if sz < min_cluster_size]
        if len(big) == 2:  # true split: both children become new clusters
            for c, sz in big:
                relabel[c] = next_label
                c_parent.append(cl)
                c_child.append(next_label)
                c_lambda.append(lv)
                c_size.append(sz)
                next_label += 1
                if c >= n:
                    stack.append(c)
        else:
            for c, _ in small:  # small side's points fall out of cl at lv
                for p in leaves(c):
                    c_parent.append(cl)
                    c_child.append(p)
                    c_lambda.append(lv)
                    c_size.append(1)
            for c, _ in big:  # big side continues as the same cluster
                if c >= n:
                    relabel[c] = cl
                    stack.append(c)
                else:  # a bare point can be >= mcs only if mcs <= 1
                    c_parent.append(cl)
                    c_child.append(c)
                    c_lambda.append(lv)
                    c_size.append(1)

    return (
        np.asarray(c_parent, np.int64),
        np.asarray(c_child, np.int64),
        np.asarray(c_lambda, np.float64),
        np.asarray(c_size, np.int64),
    )


def labels_from_mst(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    n: int,
    min_cluster_size: int,
) -> HDBSCANResult:
    """Host-side HDBSCAN tail: single linkage → condensed tree →
    stability → excess-of-mass selection → labels + probabilities."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    weight = np.asarray(weight, np.float64)

    children, dist, size = _single_linkage(src, dst, weight, n)

    c_parent, c_child, c_lambda, c_size = _condense(
        children, dist, size, n, min_cluster_size
    )
    next_label = int(c_parent.max(initial=n)) + 1 if len(c_parent) else n + 1
    next_label = max(next_label, int(c_child.max(initial=n - 1)) + 1)

    # --- stability: sum over rows of (lambda - birth[parent]) * size ---
    births = {n: 0.0}
    for ch, lv in zip(c_child, c_lambda):
        if ch >= n:
            births[ch] = lv
    stability = {c: 0.0 for c in range(n, next_label)}
    for pa, lv, sz in zip(c_parent, c_lambda, c_size):
        contrib = (lv - births[pa]) * sz
        if np.isfinite(contrib):
            stability[pa] += contrib

    cluster_rows = c_child >= n
    kids = {}  # cluster -> list of child clusters
    for pa, ch in zip(c_parent[cluster_rows], c_child[cluster_rows]):
        kids.setdefault(pa, []).append(ch)

    # --- excess-of-mass selection (root n never selected) ---
    selected = {c: True for c in range(n + 1, next_label)}
    for node in sorted(selected, reverse=True):
        sub = sum(stability[c] for c in kids.get(node, []))
        if sub > stability[node]:
            selected[node] = False
            stability[node] = sub
        else:
            stack = list(kids.get(node, []))
            while stack:
                c = stack.pop()
                selected[c] = False
                stack.extend(kids.get(c, []))

    chosen = sorted(c for c, s in selected.items() if s)
    label_of = {c: i for i, c in enumerate(chosen)}
    cluster_parent = {ch: pa for pa, ch in zip(c_parent[cluster_rows], c_child[cluster_rows])}

    # per-cluster max lambda over its direct rows (for probabilities)
    max_lambda = {}
    for pa, lv in zip(c_parent, c_lambda):
        if np.isfinite(lv):
            max_lambda[pa] = max(max_lambda.get(pa, 0.0), lv)

    labels = np.full(n, -1, np.int64)
    probabilities = np.zeros(n, np.float64)
    point_rows = ~cluster_rows
    for pa, p, lv in zip(c_parent[point_rows], c_child[point_rows], c_lambda[point_rows]):
        c = pa
        while c != n and not selected.get(c, False):
            c = cluster_parent[c]
        if c == n:
            continue
        labels[p] = label_of[c]
        ml = max_lambda.get(c, 0.0)
        probabilities[p] = 1.0 if (ml <= 0.0 or not np.isfinite(lv)) else min(lv, ml) / ml
    return HDBSCANResult(labels, probabilities)


def hdbscan(
    x,  # [n, d] array (jax or numpy)
    min_cluster_size: int,
    min_samples: Optional[int] = None,
) -> HDBSCANResult:
    """Full HDBSCAN: device MST + host extraction.  `min_samples`
    defaults to `min_cluster_size` (sklearn's default)."""
    n = x.shape[0]
    ms = min(min_cluster_size if min_samples is None else min_samples, n)
    src, dst, w = mutual_reachability_mst(jnp.asarray(x), min_samples=ms)
    return labels_from_mst(np.asarray(src), np.asarray(dst), np.asarray(w), n, min_cluster_size)


def hdbncut_sample_indices(
    features,  # [n, d]
    num_sample: int,
    key: jax.Array,
    cluster_size_threshold: float = 0.01,
    min_samples: int = 512,
    pca_dim: int = 8,
) -> np.ndarray:
    """HDBNCUT's Nyström-anchor filter (`modeling_spectral.py:24-39`):
    PCA to `pca_dim`, HDBSCAN-label, draw up to `num_sample` anchor
    indices uniformly from the *clustered* (non-noise) points.

    Upstream computes this and then accidentally discards it (passes the
    original `precomputed_sampled_indices` through); here the filtered
    draw is returned for the caller to feed to `ncut`'s
    `sample_indices`.  Returns a host numpy index array (debug path).
    """
    n = features.shape[0]
    u, s, _ = pca_lowrank(jnp.asarray(features), q=pca_dim)
    pca_x = u * s[None, :]
    mcs = max(int(cluster_size_threshold * n), 2)
    labels, _ = hdbscan(pca_x, min_cluster_size=mcs, min_samples=min(min_samples, n))
    clustered = np.where(labels != -1)[0]
    if clustered.size == 0:  # degenerate: everything is noise — fall back
        clustered = np.arange(n)
    perm = np.asarray(jax.random.permutation(key, clustered.size))
    return clustered[perm[:num_sample]]
