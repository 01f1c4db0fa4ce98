"""Nyström normalized-cuts spectral embedding.

TPU-native replacement for `ncut_pytorch.NCUT` as consumed by the
reference's clustering module (`model/clustering/modeling_spectral.py:54-69,
86-90`; `modeling.py:7`): subsample → affinity (cosine / rbf, with an
affinity focal gamma) → symmetric-normalized affinity → `eigh` →
Nyström propagation to all points.

Everything is static-shape and jittable: the sample count is a compile
time constant, membership restriction (the per-parent-cluster NCut of
`modeling_spectral.py:85-90`) is expressed with a boolean mask — samples
are drawn from members and non-members receive zero affinity.

Eigenvalues are those of the normalized affinity, sorted descending in
[0, 1] — the quantity the reference thresholds to pick the number of
child clusters (`modeling_spectral.py:87`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _cross(a: jnp.ndarray, b: jnp.ndarray, dtype) -> jnp.ndarray:
    """a @ b.T with `dtype` MXU inputs and f32 accumulation.  bf16 inputs
    run the dominant [n, m] cross-product at 2× the f32 MXU rate; the
    ~0.4% relative error on the cross term is noise at clustering
    precision (norms/means stay f32)."""
    return jax.lax.dot_general(
        a.astype(dtype), b.astype(dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pairwise_affinity(
    a: jnp.ndarray,  # [m, d]
    b: jnp.ndarray,  # [n, d]
    distance: str,
    gamma: float,
    matmul_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """A = exp(−d / γ) with d ∈ [0, ~1]: cosine distance, or squared
    euclidean scaled to a comparable range."""
    if distance == "cosine":
        an = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
        bn = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
        d = 1.0 - _cross(an, bn, matmul_dtype)
    elif distance == "rbf":
        sq = (
            jnp.sum(a**2, -1)[:, None]
            + jnp.sum(b**2, -1)[None, :]
            - 2.0 * _cross(a, b, matmul_dtype)
        )
        sq = jnp.maximum(sq, 0.0)
        # scale by the mean squared distance so gamma is unitless
        d = sq / (jnp.mean(sq) + 1e-8)
    else:
        raise ValueError(distance)
    return jnp.exp(-d / gamma)


def _topk_eig_subspace(
    m_norm: jnp.ndarray,  # [m, m] symmetric
    k: int,
    key: jax.Array,
    iters: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k eigenpairs by randomized subspace (orthogonal) iteration.

    TPU-first replacement for a dense `eigh`: XLA lowers `eigh` on TPU via
    a QDWH expansion whose cost explodes on batched operands (measured
    19.4 s for a [16,512,512] batch on v5e vs 77 ms for one [512,512] —
    benchmarks/RESULTS.md).  Subspace iteration is all MXU matmuls plus a
    tiny [2k, 2k] eigh: oversample 2k random directions, power-iterate
    with CholeskyQR re-orthonormalization, then Rayleigh–Ritz project.
    Exactly the spectrum-top the NCut child-count threshold consumes
    (reference `modeling_spectral.py:87`)."""
    m = m_norm.shape[-1]
    k2 = min(2 * k, m)
    q = jax.random.normal(key, (m, k2), jnp.float32)

    def ortho(y):
        # CholeskyQR2: two Gram-based passes are enough at f32 for the
        # well-conditioned iterates here; stays entirely on the MXU.
        for _ in range(2):
            g = y.T @ y
            c = jnp.linalg.cholesky(g + 1e-7 * jnp.eye(k2, dtype=y.dtype))
            y = jax.lax.linalg.triangular_solve(
                c, y, left_side=False, lower=True, transpose_a=True
            )
        return y

    # fori_loop keeps the HLO small (the unrolled form blew past the
    # remote-compile relay's request size limit when vmapped over the
    # cluster axis inside the full multistate graph)
    q = ortho(q)
    q = jax.lax.fori_loop(0, iters, lambda _, qq: ortho(m_norm @ qq), q)

    h = q.T @ (m_norm @ q)  # [k2, k2]
    vals, vecs = jnp.linalg.eigh((h + h.T) / 2.0)
    vals = vals[::-1][:k]
    vecs = vecs[:, ::-1][:, :k]
    return q @ vecs, vals  # [m, k], [k]


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_eig", "num_sample", "distance", "gamma", "eig_method",
        "eig_iters", "matmul_dtype", "anchors_per_parent",
    ),
)
def ncut_shared(
    x: jnp.ndarray,  # [n, d]
    num_eig: int,
    key: jax.Array,
    member: jnp.ndarray,  # [C, n] bool — per-parent token membership
    num_sample: int = 1024,
    anchors_per_parent: int = 256,
    distance: str = "rbf",
    gamma: float = 3.0,
    eig_method: str = "subspace",
    eig_iters: int = 12,
    matmul_dtype: str = "bfloat16",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-parent NCut with ONE shared Nyström anchor pool (r3 fast path).

    The reference clusters each parent independently, which under vmap
    means C copies of the two affinity cross-products ([m,m] anchor-anchor
    and [n,m] token-anchor) and C full-size [m,m] eigensolves — the
    dominant cost of the multistate forward (benchmarks/RESULTS.md).

    Deviation (config-gated, off by default): sample a single pool of
    `num_sample` anchors from all member tokens, compute both affinity
    products once, and give each parent the ≤`anchors_per_parent` pool
    anchors that fall inside it (compact gather) — so the per-parent
    eigensolve shrinks to [mc, mc] and the affinity work is shared.  Each
    parent's anchor budget is ∝ its token share (capped at mc) instead of
    a full independent `num_sample` draw; on separated clusters the
    embeddings agree with per-parent mode (tests/test_shared_anchors.py).

    Returns (eigvecs [C, n, num_eig], eigvals [C, num_eig] descending).
    """
    c_max, n = member.shape
    x = x.astype(jnp.float32)
    m = min(num_sample, n)
    mc = min(anchors_per_parent, m)
    mm_dtype = jnp.dtype(matmul_dtype)

    member_f = member.astype(jnp.float32)
    any_member = jnp.any(member, axis=0)

    # one global Gumbel top-m anchor draw over tokens valid in any parent
    k_pool, k_sel = jax.random.split(key)
    g = -jnp.log(-jnp.log(
        jax.random.uniform(k_pool, (n,), minval=1e-9, maxval=1.0)))
    pool_idx = jax.lax.top_k(jnp.where(any_member, g, -jnp.inf), m)[1]  # [m]
    xs = x[pool_idx]
    pool_valid = any_member[pool_idx]

    # per-parent compact anchor selection: the ≤mc pool anchors inside the
    # parent (Gumbel tie-break keeps the subsample unbiased when a big
    # parent owns more than mc pool anchors).  The per-parent affinities
    # are then recomputed from the gathered anchor FEATURES [C, mc, d]
    # rather than gathered from shared [m,m]/[n,m] products: the values
    # are identical, but [n, mc] column-gathers of a shared product are
    # slower on TPU than the mc-sized cross-product matmuls themselves
    # (chip-measured: the gather formulation lost 12.6 ms/batch e2e).
    amem = member_f[:, pool_idx] * pool_valid[None, :]  # [C, m]
    g2 = -jnp.log(-jnp.log(jax.random.uniform(
        k_sel, (c_max, m), minval=1e-9, maxval=1.0)))
    sel = jax.lax.top_k(jnp.where(amem > 0, g2, -jnp.inf), mc)[1]  # [C, mc]
    sel_valid = jnp.take_along_axis(amem, sel, axis=1) > 0  # [C, mc]
    xs_sel = xs[sel]  # [C, mc, d] feature gather (small)

    def one_parent(xs_c, valid_c, mem_c, k_c):
        a_cc = _pairwise_affinity(xs_c, xs_c, distance, gamma, mm_dtype)
        vmask = valid_c[:, None] & valid_c[None, :]
        a_cc = jnp.where(vmask, a_cc, 0.0)
        d_s = jnp.sum(a_cc, axis=-1)
        d_inv_sqrt = jnp.where(d_s > 0, jax.lax.rsqrt(d_s + 1e-8), 0.0)
        m_norm = a_cc * d_inv_sqrt[:, None] * d_inv_sqrt[None, :]

        if eig_method == "subspace":
            v, eigvals = _topk_eig_subspace(m_norm, num_eig, k_c, eig_iters)
        else:
            ev, evec = jnp.linalg.eigh(m_norm)
            eigvals = ev[::-1][:num_eig]
            v = evec[:, ::-1][:, :num_eig]

        a_nc = _pairwise_affinity(x, xs_c, distance, gamma, mm_dtype)
        a_nc = jnp.where(
            (mem_c[:, None] > 0) & valid_c[None, :], a_nc, 0.0
        )
        d_n = jnp.sum(a_nc, axis=-1)
        dn_inv_sqrt = jnp.where(d_n > 0, jax.lax.rsqrt(d_n + 1e-8), 0.0)
        lam_inv = jnp.where(jnp.abs(eigvals) > 1e-6, 1.0 / eigvals, 0.0)
        f = (a_nc * dn_inv_sqrt[:, None]) @ (
            v * (d_inv_sqrt[:, None] * lam_inv[None, :])
        )
        f = f / (jnp.linalg.norm(f, axis=0, keepdims=True) + 1e-8)
        return f, eigvals

    keys = jax.random.split(key, c_max)
    return jax.vmap(one_parent)(xs_sel, sel_valid, member_f, keys)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_eig", "num_sample", "distance", "gamma", "eig_method",
        "eig_iters", "matmul_dtype",
    ),
)
def ncut(
    x: jnp.ndarray,  # [n, d]
    num_eig: int,
    key: jax.Array,
    num_sample: int = 1024,
    distance: str = "rbf",
    gamma: float = 3.0,
    mask: Optional[jnp.ndarray] = None,  # [n] bool — restrict to members
    eig_method: str = "eigh",  # "eigh" (exact) | "subspace" (all-matmul)
    eig_iters: int = 12,
    matmul_dtype: str = "bfloat16",  # affinity cross-product MXU dtype
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (eigvecs [n, num_eig] — rows for non-members are arbitrary,
    eigvals [num_eig] descending)."""
    n = x.shape[0]
    x = x.astype(jnp.float32)
    m = min(num_sample, n)

    if mask is None:
        member_w = jnp.ones((n,))
    else:
        member_w = mask.astype(jnp.float32)

    # sample member indices (Gumbel top-k ≈ weighted sampling w/o replacement;
    # if fewer members than samples, duplicates enter via the fallback weight)
    g = -jnp.log(-jnp.log(jax.random.uniform(key, (n,), minval=1e-9, maxval=1.0)))
    scores = jnp.where(member_w > 0, g, -jnp.inf)
    sample_idx = jax.lax.top_k(scores, m)[1]  # [m]
    xs = x[sample_idx]
    sample_valid = member_w[sample_idx] > 0  # guards the all-masked corner

    mm_dtype = jnp.dtype(matmul_dtype)
    a_ss = _pairwise_affinity(xs, xs, distance, gamma, mm_dtype)  # [m, m]
    vmask = sample_valid[:, None] & sample_valid[None, :]
    a_ss = jnp.where(vmask, a_ss, 0.0)

    d_s = jnp.sum(a_ss, axis=-1)  # [m]
    d_inv_sqrt = jnp.where(d_s > 0, jax.lax.rsqrt(d_s + 1e-8), 0.0)
    m_norm = a_ss * d_inv_sqrt[:, None] * d_inv_sqrt[None, :]

    if eig_method == "subspace":
        key, k_sub = jax.random.split(key)
        v, eigvals = _topk_eig_subspace(m_norm, num_eig, k_sub, eig_iters)
    else:
        eigvals, eigvecs = jnp.linalg.eigh(m_norm)  # ascending
        eigvals = eigvals[::-1][:num_eig]  # [num_eig] descending
        v = eigvecs[:, ::-1][:, :num_eig]  # [m, num_eig]

    # Nyström extension to all points:
    # f = D_n^{-1/2} A_nm D_s^{-1/2} V Λ^{-1}
    a_nm = _pairwise_affinity(x, xs, distance, gamma, mm_dtype)  # [n, m]
    a_nm = jnp.where(
        (member_w[:, None] > 0) & sample_valid[None, :], a_nm, 0.0
    )
    d_n = jnp.sum(a_nm, axis=-1)
    dn_inv_sqrt = jnp.where(d_n > 0, jax.lax.rsqrt(d_n + 1e-8), 0.0)
    lam_inv = jnp.where(jnp.abs(eigvals) > 1e-6, 1.0 / eigvals, 0.0)
    f = (a_nm * dn_inv_sqrt[:, None]) @ (v * (d_inv_sqrt[:, None] * lam_inv[None, :]))

    # column-normalize for a stable embedding scale
    f = f / (jnp.linalg.norm(f, axis=0, keepdims=True) + 1e-8)
    return f, eigvals


def kway_ncut(
    x: jnp.ndarray,  # [n, k] spectral embedding (top-k eigenvectors)
    iters: int = 30,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multiclass spectral discretization (Yu & Shi 2003) — the
    `ncut_pytorch.kway_ncut` the reference's debug path calls to turn the
    spectral embedding into axis-aligned cluster assignments
    (`modeling_spectral.py:137-140`: `aa_boosted_spectral` /
    `aa_spectral`).

    Returns ``(onehot [n, k], rotation [k, k])`` with
    ``onehot ≈ one_hot(argmax(x̃ @ rotation))``; cluster id is
    ``argmax(onehot, -1)``, and the rotation can re-align held-out rows
    (`x_new @ rotation`).

    Algorithm: row-normalize, greedy near-orthogonal row init for R,
    then a fixed-count alternation of discretize (row argmax one-hot)
    and orthogonal Procrustes (small [k,k] SVD) — [n,k]·[k,k] matmuls
    plus an O(k³) SVD per step, trivially cheap at debug scale.
    """
    n, k = x.shape
    x = x.astype(jnp.float32)
    xn = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-8)

    # Greedy init (Yu–Shi): start from the largest-norm row, then pick
    # each next basis row to minimize accumulated |cos| to chosen rows.
    rows = [xn[jnp.argmax(jnp.linalg.norm(x, axis=1))]]
    c = jnp.zeros((n,), jnp.float32)
    for _ in range(k - 1):
        c = c + jnp.abs(xn @ rows[-1])
        rows.append(xn[jnp.argmin(c)])
    r0 = jnp.stack(rows, axis=1)  # [k, k]: columns are basis directions

    def step(_, r):
        d = jax.nn.one_hot(jnp.argmax(xn @ r, axis=1), k, dtype=jnp.float32)
        # Procrustes: max_R tr(Rᵀ X̃ᵀ D), X̃ᵀD = U S Vᵀ → R = U Vᵀ
        u, _, vt = jnp.linalg.svd(xn.T @ d, full_matrices=False)
        return u @ vt

    r = jax.lax.fori_loop(0, iters, step, r0)
    onehot = jax.nn.one_hot(jnp.argmax(xn @ r, axis=1), k, dtype=jnp.float32)
    return onehot, r
