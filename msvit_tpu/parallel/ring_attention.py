"""Ring attention: exact sequence-parallel attention over a device mesh.

No reference counterpart — the reference manages sequence length
architecturally (SURVEY §5 "long-context": cluster-restricted masks,
quadtree token pruning, KV-cache freeze).  Those cover its ≤~1.6k token
regime; this op is the TPU-native capability for going beyond it: shard
the TOKEN axis across devices and never materialize a full [N, N] score
matrix on any chip.

Design (blockwise online softmax over an ICI ring):

* Each device holds its Q/K/V shard `[b_local, n_local, H, dh]`
  (batch on the "data" mesh axis, tokens on `axis_name`).
* `s = mesh.shape[axis_name]` ring steps: at step t the device combines
  its local queries with the K/V block that started `t` hops away, then
  `ppermute`s the K/V block to its ring neighbour.  Compute and the ICI
  transfer overlap (the permute is issued inside the same step).
* Numerics: flash-style running (m, l, acc) in f32 — exactly softmax(QKᵀ)V
  at convergence, verified against dense attention by
  tests/test_ring_attention.py (8 virtual devices).
* Optional `key_padding_mask [B, N]` (True = attend) rides the same ring
  as K/V; fully-masked rows degrade to 0 (they never occur in-model:
  every query attends to itself).

This is the exact-attention member of the sequence-parallel family; the
Megatron-SP activation sharding in `models/base/model.py::constrain`
(config.sequence_sharding) shards the *elementwise/MLP* path while
attention gathers — ring attention removes that gather for long
sequences.  Differentiable (shard_map + ppermute have transposes);
gradient parity is part of the test."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def _ring_attention_local(
    q: jnp.ndarray,  # [b, nq, H, dh] local
    k: jnp.ndarray,  # [b, nk, H, dh] local
    v: jnp.ndarray,  # [b, nk, H, dh] local
    kmask: jnp.ndarray,  # [b, nk] bool local (True = attend)
    axis_name: str,
    scale: float,
):
    axis_size = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    b, nq, h, dh = q.shape
    qf = q.astype(jnp.float32) * scale

    # derive the initial carries from qf so they inherit its varying
    # manual axes (jax>=0.9 shard_map vma tracking rejects replicated
    # carry-in vs varying carry-out)
    zero_bhq = jnp.transpose(qf[..., 0] * 0.0, (0, 2, 1))  # [b,h,nq]
    m0 = zero_bhq - jnp.inf
    l0 = zero_bhq
    acc0 = jnp.transpose(qf * 0.0, (0, 2, 1, 3))  # [b,h,nq,dh]

    def body(_, carry):
        k_cur, v_cur, mask_cur, m, l, acc = carry
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", qf, k_cur.astype(jnp.float32)
        )  # [b,h,nq,nk]
        s = jnp.where(mask_cur[:, None, None, :], s, -jnp.inf)
        m_blk = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m, m_blk)
        # guard fully-masked-so-far rows: exp(-inf - -inf) → use finite shift
        shift = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(s - shift[..., None])
        p = jnp.where(mask_cur[:, None, None, :], p, 0.0)
        corr = jnp.where(
            jnp.isfinite(m), jnp.exp(m - shift), 0.0
        )
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, v_cur.astype(jnp.float32)
        )
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        mask_cur = jax.lax.ppermute(mask_cur, axis_name, perm)
        return k_cur, v_cur, mask_cur, m_new, l, acc

    _, _, _, _, l, acc = jax.lax.fori_loop(
        0, axis_size, body, (k, v, kmask, m0, l0, acc0)
    )
    out = acc / jnp.maximum(l, 1e-30)[..., None]  # [b,h,nq,dh]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)  # [b,nq,h,dh]


def ring_attention(
    q: jnp.ndarray,  # [B, N, H, dh]
    k: jnp.ndarray,  # [B, N, H, dh]
    v: jnp.ndarray,  # [B, N, H, dh]
    mesh: Mesh,
    key_padding_mask: Optional[jnp.ndarray] = None,  # [B, N] bool
    batch_axis: Optional[str] = "data",
    axis_name: str = "model",
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact softmax(QKᵀ/√dh)·V with the token axis sharded on
    `axis_name` of `mesh` (and batch on `batch_axis`, if given).  N must
    divide by the axis size.  Returns [B, N, H, dh] sharded like q."""
    b, n, h, dh = q.shape
    s = mesh.shape[axis_name]
    if n % s:
        raise ValueError(f"token count {n} not divisible by mesh axis "
                         f"{axis_name}={s}; pad to a multiple")
    if scale is None:
        scale = dh ** -0.5
    if key_padding_mask is None:
        key_padding_mask = jnp.ones((b, n), bool)

    spec = P(batch_axis, axis_name, None, None)
    mspec = P(batch_axis, axis_name)
    fn = functools.partial(
        _ring_attention_local, axis_name=axis_name, scale=float(scale)
    )
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec, spec, spec, mspec),
        out_specs=spec,
    )
    args = (q, k, v, key_padding_mask)
    placed = tuple(
        jax.lax.with_sharding_constraint(a, NamedSharding(mesh, sp))
        for a, sp in zip(args, (spec, spec, spec, mspec))
    )
    return mapped(*placed)
