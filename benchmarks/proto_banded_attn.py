"""Chip race: cluster-banded attention vs the dense grouped packed
kernel at the BASELINE multistate trunk shape (bs8, C=16, N=784 → S=816,
12 heads, dh=64, bf16).

Correctness first (vs the XLA oracle with the same dropped-leak
semantics), then same-process back-to-back timing across cluster-size
distributions from best case (balanced 16-way) to worst (one cluster =
the pregeneration layers, where the band covers everything).

    python benchmarks/proto_banded_attn.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax
import jax.numpy as jnp

from _timing import bench_queued
from msvit_tpu.models.multistate.model import build_multistate_attention_mask
from msvit_tpu.ops.banded_attention import (
    BandedSegments,
    _token_rows_banded,
    _token_rows_xla,
    multistate_banded_attention,
)
from msvit_tpu.ops.packed_attention import packed_attention

B, C, N, H, DH = 8, 16, 784, 12, 64
D = H * DH
S = 2 * C + N


def sorted_cid(sizes):
    assert sum(sizes) == N
    return np.concatenate(
        [np.full(s, i, np.int32) for i, s in enumerate(sizes)]
    )


CASES = {
    "balanced16": [49] * 15 + [49 + N - 49 * 16],
    "skewed": [300, 150, 100, 80, 60, 40, 20, 10, 8, 6, 4, 2, 2, 1, 1, 0],
    "few4": [300, 250, 150, 84] + [0] * 12,
    "one": [N] + [0] * 15,
}


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    qkv = (
        jax.random.normal(key, (B, S, 3 * D), jnp.float32) * 0.3
    ).astype(jnp.bfloat16)

    fwd_banded = jax.jit(
        lambda a, ci, nc: multistate_banded_attention(
            a,
            BandedSegments(
                cid=ci, n_clusters=nc, max_clusters=C, mask_inf=1e2
            ),
            H,
        )
    )
    fwd_packed = jax.jit(
        lambda a, m: packed_attention(a, H, mask=m, scale=1.0)
    )

    # -- correctness at the production shape (skewed case) --------------
    cid = jnp.asarray(np.tile(sorted_cid(CASES["skewed"]), (B, 1)))
    nc = jnp.full((B,), int(np.asarray(cid).max()) + 1, jnp.int32)
    got = np.asarray(
        _token_rows_banded(qkv, cid, H, C).astype(jnp.float32)
    )
    want = np.asarray(
        _token_rows_xla(
            qkv.astype(jnp.float32), cid, H, C
        )
    )
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"token-rows max rel err vs f32 oracle (bf16 kernel): {err:.2e}")
    assert err < 0.03, "banded kernel diverges from oracle"

    # dense-path comparison for the full op
    mask = build_multistate_attention_mask(cid, nc, C)
    additive = jnp.where(mask, 0.0, -1e2).astype(jnp.float32)
    full_b = np.asarray(fwd_banded(qkv, cid, nc).astype(jnp.float32))
    full_d = np.asarray(fwd_packed(qkv, additive).astype(jnp.float32))
    err = np.abs(full_b - full_d).max() / (np.abs(full_d).max() + 1e-9)
    print(f"full op vs dense packed kernel max rel err: {err:.2e}")

    # -- race ------------------------------------------------------------
    iters = 30
    for name, sizes in CASES.items():
        cid = jnp.asarray(np.tile(sorted_cid(sizes), (B, 1)))
        nc = jnp.full((B,), max(int(np.asarray(cid).max()) + 1, 1), jnp.int32)
        mask = build_multistate_attention_mask(cid, nc, C)
        additive = jnp.where(mask, 0.0, -1e2).astype(jnp.float32)

        qs = [
            (qkv + jnp.bfloat16(i * 1e-3)).astype(jnp.bfloat16)
            for i in range(4)
        ]
        tb = bench_queued(
            lambda i: jnp.sum(
                fwd_banded(qs[i % 4], cid, nc).astype(jnp.float32)
            ),
            iters=iters,
        )
        td = bench_queued(
            lambda i: jnp.sum(
                fwd_packed(qs[i % 4], additive).astype(jnp.float32)
            ),
            iters=iters,
        )
        print(
            f"{name:>10}: banded {tb * 1e3:6.3f} ms  dense {td * 1e3:6.3f} ms"
            f"  ({td / tb:4.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
