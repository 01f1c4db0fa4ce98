"""Fixed-iteration KMeans on TPU.

Replaces `cuml.cluster.KMeans` (reference `modeling_spectral.py:8,90`):
a jittable Lloyd's loop expressed as segment sums (one-hot matmuls — MXU
friendly), with two static-shape extensions needed by the clustering
module:

* `active` — only the first k centers participate (the reference picks a
  data-dependent number of child clusters from the eigenvalue threshold,
  `modeling_spectral.py:87-90`; under XLA we run with k_max centers and
  mask the inactive ones);
* `mask` — only member points contribute to updates and receive labels
  (per-parent-cluster clustering).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(
    x: jnp.ndarray,  # [n, d]
    k: int,
    key: jax.Array,
    iters: int = 16,
    active: Optional[jnp.ndarray] = None,  # [k] bool (default: all)
    mask: Optional[jnp.ndarray] = None,  # [n] bool (default: all)
    init_centers: Optional[jnp.ndarray] = None,  # [k, d] explicit init
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (labels [n] int32 in [0, k), centers [k, d]).  Labels of
    masked-out points are arbitrary (they track the nearest active center).

    `init_centers` (the reference's `KMeans(init=...)` seeding from
    HDBSCAN centroids, `modeling_spectral.py:131-135` and `:268-274`)
    replaces the default Gumbel-top-k point draw when given.
    """
    n, d = x.shape
    x = x.astype(jnp.float32)
    member = (
        jnp.ones((n,), bool) if mask is None else mask.astype(bool)
    )
    act = jnp.ones((k,), bool) if active is None else active.astype(bool)

    if init_centers is None:
        # init: k distinct member points (Gumbel top-k)
        g = -jnp.log(-jnp.log(jax.random.uniform(key, (n,), minval=1e-9, maxval=1.0)))
        idx = jax.lax.top_k(jnp.where(member, g, -jnp.inf), k)[1]
        centers = x[idx]  # [k, d]
    else:
        centers = init_centers.astype(jnp.float32)

    def assign(centers):
        d2 = (
            jnp.sum(x**2, -1)[:, None]
            - 2.0 * (x @ centers.T)
            + jnp.sum(centers**2, -1)[None, :]
        )  # [n, k]
        d2 = jnp.where(act[None, :], d2, jnp.inf)
        return jnp.argmin(d2, axis=-1).astype(jnp.int32)

    def body(_, centers):
        labels = assign(centers)
        onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)  # [n, k]
        onehot = onehot * member[:, None]
        counts = jnp.sum(onehot, axis=0)  # [k]
        sums = onehot.T @ x  # [k, d]
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # empty clusters keep their previous center
        return jnp.where((counts > 0)[:, None], new, centers)

    centers = jax.lax.fori_loop(0, iters, body, centers)
    return assign(centers), centers
