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
