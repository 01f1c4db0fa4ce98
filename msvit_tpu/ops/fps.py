"""Farthest point sampling (PointNet++-style) as a `lax.fori_loop`.

The reference *intends* to use FPS in its fps-clustering variant but the
function is missing upstream (`modeling_fps.py:40,49` calls a nonexistent
`utils.fps`; `torch_fpsample` is imported but not in requirements —
SURVEY §2.4).  This is the implementation of that evident intent.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k",))
def farthest_point_sampling(
    x: jnp.ndarray,  # [n, d]
    k: int,
    key: Optional[jax.Array] = None,
    mask: Optional[jnp.ndarray] = None,  # [n] bool
) -> jnp.ndarray:
    """Greedy max-min selection of k indices.  The first point is random
    (if key given) else index 0; masked-out points are never selected."""
    n = x.shape[0]
    x = x.astype(jnp.float32)
    member = jnp.ones((n,), bool) if mask is None else mask.astype(bool)

    if key is not None:
        g = -jnp.log(
            -jnp.log(jax.random.uniform(key, (n,), minval=1e-9, maxval=1.0))
        )
        first = jnp.argmax(jnp.where(member, g, -jnp.inf))
    else:
        first = jnp.argmax(member)  # first member index

    sq = jnp.sum(x**2, axis=-1)

    def dist_to(i):
        return sq + sq[i] - 2.0 * (x @ x[i])

    init_idx = jnp.zeros((k,), jnp.int32).at[0].set(first.astype(jnp.int32))
    init_min = jnp.where(member, dist_to(first), -jnp.inf)

    def body(i, carry):
        idx, min_d = carry
        nxt = jnp.argmax(min_d).astype(jnp.int32)
        idx = idx.at[i].set(nxt)
        min_d = jnp.minimum(min_d, jnp.where(member, dist_to(nxt), -jnp.inf))
        return idx, min_d

    idx, _ = jax.lax.fori_loop(1, k, body, (init_idx, init_min))
    return idx


@functools.partial(jax.jit, static_argnames=("k", "groups"))
def farthest_point_sampling_blocked(
    x: jnp.ndarray,  # [n, d]
    k: int,
    key: Optional[jax.Array] = None,
    mask: Optional[jnp.ndarray] = None,  # [n] bool
    groups: int = 8,
) -> jnp.ndarray:
    """Approximate FPS with G-way parallel greedy chains.

    Exact FPS is a length-k serial dependency chain of tiny ops — poison
    on TPU (each step is an argmax + one matvec; the chain dominated the
    fps-clustering forward).  Here the points are partitioned SPATIALLY
    (contiguous buckets of the first-coordinate sort — callers pass
    PCA-ed data, so coordinate 0 is the principal direction) and exact
    FPS(k/groups) runs vmapped (parallel) within each bucket: serial
    depth k/G instead of k, and disjoint regions keep the union
    complementary (a random partition makes every group pick the same
    global extremes — measured 10/16 cluster coverage vs 14-16/16
    spatial, 16/16 exact).  Appropriate when FPS seeds *candidates* that
    a downstream scoring step filters (the fps-clustering pipeline,
    `models/clustering/module.py::fps_cluster`); use
    `farthest_point_sampling` when exact max-min order matters."""
    n = x.shape[0]
    g = groups
    while k % g:
        g //= 2
    if g <= 1:
        return farthest_point_sampling(x, k, key=key, mask=mask)
    member = jnp.ones((n,), bool) if mask is None else mask.astype(bool)

    # masked-out points sort to the end and land in the last buckets,
    # where the per-group mask removes them
    sort_key = jnp.where(member, x[:, 0].astype(jnp.float32), jnp.inf)
    perm = jnp.argsort(sort_key)
    n_pad = -(-n // g) * g
    perm_p = jnp.concatenate([perm, perm[: n_pad - n]])  # wrap-pad
    xg = x[perm_p].reshape(g, n_pad // g, -1)
    mg = member[perm_p].reshape(g, n_pad // g)
    # wrap-padded duplicates: mask them out of their second occurrence
    dup = jnp.arange(n_pad) >= n
    mg = mg & ~dup.reshape(g, n_pad // g)

    keys = (
        jax.random.split(key, g) if key is not None else [None] * g
    )

    def one(xb, mb, kb):
        return farthest_point_sampling(xb, k // g, key=kb, mask=mb)

    if key is not None:
        sub = jax.vmap(one)(xg, mg, jnp.stack(list(keys)))
    else:
        sub = jax.vmap(lambda xb, mb: one(xb, mb, None))(xg, mg)
    flat = sub + (jnp.arange(g) * (n_pad // g))[:, None]  # [g, k/g]
    return perm_p[flat.reshape(-1)]
