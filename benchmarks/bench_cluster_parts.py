"""Decompose the multistate spectral-clustering critical path (VERDICT r2
item 3): which stage of `_spectral_single` owns the ~60 ms at
num_sample=1024 — sampling/gather, affinity, eigensolve, Nyström
propagation, or KMeans — and how much eigensolver variants help.

Shapes: BASELINE multistate config — bs8 × 784 tokens = 6272 flat tokens,
d=768, C=16 padded parents, m=num_sample anchors, e=8 eig dims.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import functools

import jax
import jax.numpy as jnp

from _timing import bench_queued
from msvit_tpu.ops.kmeans import kmeans
from msvit_tpu.ops.ncut import _pairwise_affinity, _topk_eig_subspace

N, D, C, E = 6272, 768, 16, 8


def data(m):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (N, D), jnp.float32)
    parents = jax.random.randint(k, (N,), 0, 6)
    member = parents[None, :] == jnp.arange(C)[:, None]  # [C, N]
    keys = jax.random.split(k, C)
    # per-parent anchor samples (the production Gumbel top-k)
    g = -jnp.log(-jnp.log(
        jax.random.uniform(k, (C, N), minval=1e-9, maxval=1.0)))
    scores = jnp.where(member, g, -jnp.inf)
    sample_idx = jax.lax.top_k(scores, m)[1]  # [C, m]
    xs = x[sample_idx]  # [C, m, D]
    m_norm = jax.vmap(lambda a: _norm_aff(a))(xs)
    return x, member, keys, sample_idx, xs, m_norm


def _norm_aff(xs):
    a = _pairwise_affinity(xs, xs, "rbf", 3.0, jnp.bfloat16)
    d = jnp.sum(a, -1)
    di = jnp.where(d > 0, jax.lax.rsqrt(d + 1e-8), 0.0)
    return a * di[:, None] * di[None, :]


def timed(tag, fn, *args):
    # queued timing: fn(i, *args) -> scalar
    dt = bench_queued(lambda i: fn(float(i), *args), iters=10)
    print(f"{tag:42s}: {dt * 1e3:7.2f} ms", flush=True)
    return dt


def main(m=1024):
    x, member, keys, sample_idx, xs, m_norm = data(m)
    jax.block_until_ready(m_norm)

    # 1. sampling + gather
    @jax.jit
    def f_sample(i, x, member):
        k = jax.random.PRNGKey(0)
        g = -jnp.log(-jnp.log(jax.random.uniform(
            k, (C, N), minval=1e-9, maxval=1.0)))
        idx = jax.lax.top_k(jnp.where(member, g + i, -jnp.inf), m)[1]
        return jnp.sum((x[idx]).astype(jnp.float32))

    timed("sample+gather [C,m,D]", f_sample, x, member)

    # 2. anchor affinity [C,m,m] + normalize
    @jax.jit
    def f_aff(i, xs):
        return jnp.sum(jax.vmap(_norm_aff)(xs + i * 1e-6))

    timed("anchor affinity+normalize [C,m,m]", f_aff, xs)

    # 3. eigensolve variants on fixed m_norm
    def eig_variant(iters, ortho_every, qr_passes):
        def one(mn, k):
            k2 = 2 * E
            q = jax.random.normal(k, (m, k2), jnp.float32)

            def ortho(y):
                for _ in range(qr_passes):
                    g = y.T @ y
                    c = jnp.linalg.cholesky(
                        g + 1e-7 * jnp.eye(k2, dtype=y.dtype))
                    y = jax.lax.linalg.triangular_solve(
                        c, y, left_side=False, lower=True, transpose_a=True)
                return y

            q = ortho(q)

            def body(t, qq):
                qq = mn @ qq
                return jax.lax.cond(
                    (t % ortho_every) == ortho_every - 1, ortho,
                    lambda y: y, qq)

            q = jax.lax.fori_loop(0, iters, body, q)
            q = ortho(q)
            h = q.T @ (mn @ q)
            vals, vecs = jnp.linalg.eigh((h + h.T) / 2.0)
            return q @ vecs[:, ::-1][:, :E], vals[::-1][:E]

        @jax.jit
        def f(i, m_norm, keys):
            v, w = jax.vmap(one)(m_norm + i * 1e-9, keys)
            return jnp.sum(v) + jnp.sum(w)

        return f

    @jax.jit
    def f_eig_prod(i, m_norm, keys):
        v, w = jax.vmap(
            lambda mn, k: _topk_eig_subspace(mn, E, k, 12)
        )(m_norm + i * 1e-9, keys)
        return jnp.sum(v) + jnp.sum(w)

    timed("eig production (12 it, QR2 each)", f_eig_prod, m_norm, keys)
    timed("eig 12 it, QR1 each", eig_variant(12, 1, 1), m_norm, keys)
    timed("eig 12 it, QR1 every 3", eig_variant(12, 3, 1), m_norm, keys)
    timed("eig 6 it, QR1 every 3", eig_variant(6, 3, 1), m_norm, keys)

    # 4. Nyström propagation [C, N, m]
    @jax.jit
    def f_nystrom(i, x, xs, member):
        def one(xs_c, mem):
            a_nm = _pairwise_affinity(x + i * 1e-6, xs_c, "rbf", 3.0,
                                      jnp.bfloat16)
            a_nm = jnp.where(mem[:, None], a_nm, 0.0)
            dn = jnp.sum(a_nm, -1)
            di = jnp.where(dn > 0, jax.lax.rsqrt(dn + 1e-8), 0.0)
            v = jnp.ones((m, E), jnp.float32)
            return (a_nm * di[:, None]) @ v

        return jnp.sum(jax.vmap(one)(xs, member))

    timed("Nystrom propagate [C,N,m]", f_nystrom, x, xs, member)

    # 5. vmapped KMeans on [C, N, E]
    sub = jax.random.normal(jax.random.PRNGKey(2), (C, N, E), jnp.float32)
    col_active = jnp.ones((C, E), bool)

    @jax.jit
    def f_km(i, sub, member):
        lab, _ = jax.vmap(
            lambda s, k, a, mm: kmeans(s, k=E, key=k, iters=16, active=a,
                                       mask=mm)
        )(sub + i * 1e-6, keys, col_active, member)
        return jnp.sum(lab)

    timed("vmapped KMeans 16 it [C,N,E]", f_km, sub, member)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    main(m)
