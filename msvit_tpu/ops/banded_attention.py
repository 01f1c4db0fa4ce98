"""Cluster-banded multistate attention (Pallas, TPU).

The multistate trunk's attention mask (reference
`modeling_msvitencoder.py:427-452`) has exact block structure: patch
tokens attend only their own cluster's tokens plus their cluster's RX
token; TX_c attends cluster c's tokens; RX tokens attend TX tokens.
With tokens **sorted by cluster id** the token↔token part becomes a
per-row contiguous band of the [N, N] score matrix, so the dense masked
kernels (`ops/packed_attention.py`) waste VPU exp/mask passes and MXU
dots on blocks that are fully masked — at the BASELINE multistate shape
(bs8, 816 rows, 12 heads) those passes dominate the trunk layer cost.

This op exploits the structure instead of masking it:

* **token rows** run a Pallas kernel over the sorted token axis whose
  per-q-block key range ``[kmin, kmax]`` (from a searchsorted band table,
  scalar-prefetched via SMEM) skips dead key blocks entirely.  Boundary
  blocks that mix clusters are fixed up with an in-kernel segment-id
  compare — the [S, S] mask is never materialized anywhere, in any
  memory space.  Each token's single extra key (its cluster's RX token)
  rides one tiny [Bq, 2C] prefix dot.  The no-max (clip ±80) shaved
  softmax of the packed kernels makes band accumulation a plain sum —
  no online-softmax rescaling (`ops/packed_attention.py:66-87`).
* **prefix rows** (the 2C TX/RX cluster tokens — 32 queries at the
  BASELINE config) are computed densely in XLA with the reference's
  exact *soft* additive mask (scores − attention_mask_inf·(1−mask)), so
  fully-masked padded slots keep their dense-path semantics (uniform
  attention) and the pooled RX→TX attention probabilities are available
  exactly.

Semantics vs the dense soft-masked path: masked token-row contributions
are dropped instead of attenuated by e^{−mask_inf} (≤ e^{−80} after the
clip — a ≤1e-30 relative deviation, far below bf16 resolution).  The
op is differentiable via a custom VJP whose backward recomputes the
same dropped-leak semantics in XLA (banded training stays correct, if
un-tuned; the production fine-tune path keeps the dense kernels).

Why not bucket-pad clusters to a static capacity instead: cluster sizes
are data-dependent and heavily unbalanced (a dominant cluster can hold
half the tokens), so any static per-cluster capacity either breaks
semantics (overflow) or pads the compute past the dense cost.  The band
is capacity-free: cost tracks the *actual* sorted layout at key-block
(128) granularity, and degrades gracefully to the dense cost when one
cluster owns everything (the pregeneration layers).

**Measured standing** (chip, same-process; full iteration history in
benchmarks/RESULTS.md "Cluster-banded attention"): the final structure
(v4: q-block grid dimension, ≤1024-key in-kernel chunks, and — the
decisive fix — 2-D-row operands with lane-block index maps into the
q/k/v thirds instead of a [B,S,3,D] view whose size-3 dim Mosaic pads
to 8 sublanes, 2.67× VMEM/DMA inflation) reaches **parity with the
dense grouped packed kernel at the BASELINE multistate shape within
chip-state variance**: across four same-process race sessions the
per-layer-attention ratio ranged 0.75-1.27× (2.2-3.0 ms vs 2.2-2.8 ms;
model-level pairs 35.8 vs 36.7 and 36.4 vs 36.0 ms/batch) — the effect
size is smaller than the documented run-to-run drift, so no speed claim
either way.  At 3136 tokens (448 px) it compiles and runs but LOSES to
the flash fallback (250 vs 218 ms/batch e2e) — the dense-MXU-rows
design pays full score dots while flash's online accumulation is
better adapted there.  Chunk-level pl.when gating of whole dead chunks
was raced separately and lost at both scales (scratch-accumulator
round-trips exceed the skipped work).  Default OFF; the structural
benefits stand regardless: no [S,S] mask in any memory space and
VMEM-bounded at any sequence length.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CLIP = 80.0
_BQ = 128  # query block (sublane dim of the score tile)
_BK = 128  # key block (lane dim — dynamic lane offsets must be 128-aligned)
_CK = 1024  # key CHUNK: caps the in-kernel f32 score row + prob scratch


class BandedSegments(NamedTuple):
    """Cluster structure handed to the attention layer in banded mode.

    ``cid`` must be sorted ascending along the token axis (the backbone
    keeps tokens cluster-sorted between re-clusterings)."""

    cid: jnp.ndarray  # [B, N] int32, sorted ascending per image
    n_clusters: jnp.ndarray  # [] or [B] int32 — valid TX/RX slots
    max_clusters: int
    mask_inf: float  # the reference's soft-mask penalty (1e2)


def _band_limits(
    cid: jnp.ndarray, max_clusters: int, n_qblocks: int
) -> jnp.ndarray:
    """[B, 2, nQB] int32: inclusive key-block range per query block.

    Query block qb spans sorted tokens [qb·BQ, (qb+1)·BQ); its live keys
    are exactly the tokens of clusters cid[first]..cid[last] — contiguous
    in the sorted layout, so one searchsorted per cluster id bounds the
    band."""
    b, n = cid.shape
    c = max_clusters

    def per_image(ci):
        starts = jnp.searchsorted(ci, jnp.arange(c), side="left")
        ends = jnp.searchsorted(ci, jnp.arange(c), side="right")
        qb = jnp.arange(n_qblocks)
        lo_ix = jnp.minimum(qb * _BQ, n - 1)
        hi_ix = jnp.minimum((qb + 1) * _BQ - 1, n - 1)
        kmin = starts[ci[lo_ix]] // _BK
        kmax = jnp.maximum((ends[ci[hi_ix]] - 1) // _BK, kmin)
        return jnp.stack([kmin, kmax]).astype(jnp.int32)

    return jax.vmap(per_image)(cid)


def _banded_kernel(
    kmm_ref,  # SMEM [1, 2, nQB] int32 — indexed by program_id(2)
    q_ref,  # [1, BQ, gw] — this program's query row block
    k_ref,  # [1, N_pad + pfx, gw] — keys: sorted tokens first, prefix LAST
    v_ref,  # [1, N_pad + pfx, gw] — values, same layout
    cidq_ref,  # [1, BQ, 1] int32 (pad = -1)
    cidk_ref,  # [1, 1, N_pad] int32 (pad = -1)
    o_ref,  # [1, BQ, gw]
    p_ref,  # VMEM scratch [BQ, min(N_pad, _CK)] — probability chunk
    *,
    hg: int,
    dh: int,
    pfx: int,  # 2C — static prefix length (prefix rows start at N_pad)
    n_qblocks: int,
):
    # Structure (third iteration).  v1 used a fori_loop of [128,128]
    # tiles with loop-carried accumulators — 2.4-4.6x SLOWER than the
    # dense kernel on chip (small-tile control flow and dynamic slices
    # dominate).  v2 unrolled all q blocks inside one program — the
    # Mosaic stack kept every q block's [BQ, N_pad] f32 scores live and
    # OOM'd scoped VMEM at 3136 tokens (25.7M > 16M) after a 23-minute
    # compile.  v3 (this): the q block is a GRID dimension — one row
    # block per program, the qkv/cid blocks' index maps are constant in
    # qb so Pallas skips their re-DMA, compile scales linearly, and the
    # per-program footprint is one score row block.  The dense kernel's
    # cost is the VPU exp/mask chain, not the MXU dots — so the score
    # and PV matmuls run DENSE over the full row (big, fast MXU ops, no
    # dynamic shapes) and only the VPU chain is predicated per key tile:
    # dead tiles get a single zero fill of the probability scratch
    # instead of mask+clip+exp+cast.
    n_pad = n_qblocks * _BK
    qb = pl.program_id(2)
    kmin = kmm_ref[0, 0, qb]
    kmax = kmm_ref[0, 1, qb]
    cq = cidq_ref[0]  # [BQ, 1]
    outs = []
    for h in range(hg):
        lanes = slice(h * dh, (h + 1) * dh)
        q = q_ref[0, :, lanes]  # [BQ, dh]
        kp = k_ref[0, n_pad:, lanes]  # [2C, dh] prefix keys
        vp = v_ref[0, n_pad:, lanes]

        # key axis in ≤_CK chunks: bounds the f32 score row and the
        # probability scratch regardless of N (the no-max softmax makes
        # chunk contributions a plain sum — no online rescale), and K/V
        # are sliced per chunk from the ref so whole-K values never
        # materialize.  One chunk at the BASELINE shape.  Chunk-level
        # pl.when gating (skip whole dead chunks into scratch
        # accumulators) was chip-raced and LOST at both 224 (overhead on
        # the lone chunk) and 448 (275 vs 250 ms e2e — the skewed bands
        # cover most of the row, so little is skipped and the scratch
        # round-trips are pure cost); chunks always run, only the
        # per-tile VPU chain is predicated.

        def do_chunk(c0, c1, acc):
            ck_len = (c1 - c0) * _BK
            rows = slice(c0 * _BK, c1 * _BK)
            k_c = k_ref[0, rows, lanes]  # [ck_len, dh]
            v_c = v_ref[0, rows, lanes]
            s = jax.lax.dot_general(
                q, k_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQ, ck_len]
            for kb in range(c0, c1):
                tile = slice((kb - c0) * _BK, (kb - c0 + 1) * _BK)
                live = (kb >= kmin) & (kb <= kmax)

                @pl.when(live)
                def _(tile=tile, kb=kb, s=s):
                    ckid = cidk_ref[0, :, kb * _BK : (kb + 1) * _BK]
                    p_ref[:, tile] = jnp.where(
                        cq == ckid,
                        jnp.exp(jnp.clip(s[:, tile], -_CLIP, _CLIP)),
                        0.0,
                    ).astype(p_ref.dtype)

                @pl.when(jnp.logical_not(live))
                def _(tile=tile):
                    p_ref[:, tile] = jnp.zeros((_BQ, _BK), p_ref.dtype)

            pb = p_ref[:, :ck_len]
            lc = jax.lax.dot_general(
                pb, jnp.ones((ck_len, 1), pb.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            oc = jax.lax.dot_general(
                pb, v_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc[0] + oc, acc[1] + lc

        acc = (
            jnp.zeros((_BQ, dh), jnp.float32),
            jnp.zeros((_BQ, 1), jnp.float32),
        )
        for c0 in range(0, n_qblocks, _CK // _BK):
            c1 = min(c0 + _CK // _BK, n_qblocks)
            acc = do_chunk(c0, c1, acc)
        o, l = acc
        # the one off-band key: this cluster's RX token (prefix row
        # 2·cid+1).  One [BQ, 2C] dot + a one-hot column mask.
        sp = jax.lax.dot_general(
            q, kp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, 2C]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, pfx), 1)
        pp = jnp.where(
            col == 2 * cq + 1, jnp.exp(jnp.clip(sp, -_CLIP, _CLIP)), 0.0
        ).astype(q_ref.dtype)
        l = l + jax.lax.dot_general(
            pp, jnp.ones((pfx, 1), q_ref.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = o + jax.lax.dot_general(
            pp, vp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # padded query rows can have an empty band (l == 0) — guard
        # the divide; their rows are sliced off by the caller
        outs.append((o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=1)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "max_clusters", "head_group")
)
def _token_rows_banded(
    qkv: jnp.ndarray,  # [B, S, 3D], rows = [2C prefix ++ sorted tokens]
    cid: jnp.ndarray,  # [B, N] int32 sorted
    num_heads: int,
    max_clusters: int,
    head_group: int = 2,
) -> jnp.ndarray:  # [B, N, D] token-row attention output
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    hg = head_group
    gw = hg * dh
    pfx = 2 * max_clusters
    n = s - pfx
    n_pad = -(-n // _BK) * _BK
    n_qblocks = n_pad // _BQ

    qkv4 = qkv.reshape(b, s, 3, d)
    # kernel layout: sorted tokens first (padded to N_pad), prefix LAST —
    # token row blocks then align with the q-block grid dimension.  The
    # array stays 2-D-rows [B, S_pad, 3D]: a [B, S, 3, D] view pads the
    # size-3 dim to 8 sublanes on TPU (2.67x VMEM inflation — this is
    # what OOM'd the 3136-token compile at 18.4M).  The q/k/v thirds are
    # addressed by lane-block index maps into the same array instead.
    tok = qkv4[:, pfx:]
    if n_pad != n:
        tok = jnp.pad(tok, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)))
    arr = jnp.concatenate([tok, qkv4[:, :pfx]], axis=1).reshape(
        b, n_pad + pfx, 3 * d
    )
    cid_pad = jnp.pad(cid, ((0, 0), (0, n_pad - n)), constant_values=-1)
    kmm = _band_limits(cid, max_clusters, n_qblocks)  # [B, 2, nQB]

    ng = d // gw  # lane blocks per qkv third
    out = pl.pallas_call(
        functools.partial(
            _banded_kernel, hg=hg, dh=dh, pfx=pfx, n_qblocks=n_qblocks
        ),
        grid=(b, ng, n_qblocks),
        in_specs=[
            pl.BlockSpec((1, 2, n_qblocks), lambda i, g, qb: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _BQ, gw), lambda i, g, qb: (i, qb, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad + pfx, gw),
                         lambda i, g, qb: (i, 0, ng + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad + pfx, gw),
                         lambda i, g, qb: (i, 0, 2 * ng + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BQ, 1), lambda i, g, qb: (i, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda i, g, qb: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BQ, gw), lambda i, g, qb: (i, qb, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((_BQ, min(n_pad, _CK)), qkv.dtype)],
        cost_estimate=pl.CostEstimate(
            # upper bound (dense band); actual flops are data-dependent
            flops=4 * b * num_heads * n * n * dh,
            bytes_accessed=qkv.size * 2 + b * n * d * 2,
            transcendentals=b * num_heads * n * n,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(kmm, arr, arr, arr, cid_pad[:, :, None], cid_pad[:, None, :])
    return out[:, :n]


def _token_rows_xla(
    qkv: jnp.ndarray, cid: jnp.ndarray, num_heads: int, max_clusters: int
) -> jnp.ndarray:
    """XLA reference for the token rows with the kernel's exact dropped-
    leak semantics (hard where, clip ±80, no row max) — the custom-VJP
    backward and the test oracle."""
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    pfx = 2 * max_clusters
    n = s - pfx
    x = qkv.reshape(b, s, 3, num_heads, dh)
    q = x[:, pfx:, 0].transpose(0, 2, 1, 3)  # [B, H, N, dh]
    k = x[:, :, 1].transpose(0, 2, 1, 3)  # [B, H, S, dh]
    v = x[:, :, 2].transpose(0, 2, 1, 3)
    # token q attends: same-cluster tokens ++ its RX (prefix col 2c+1)
    cols = jnp.arange(s)
    own_rx = cols[None, None, :] == (2 * cid[:, :, None] + 1)  # [B, N, S]
    intra = (cols[None, None, :] >= pfx) & (
        cid[:, :, None]
        == jnp.pad(cid, ((0, 0), (pfx, 0)), constant_values=-1)[:, None, :]
    )
    m = (own_rx | intra)[:, None]  # [B, 1, N, S]
    scores = jnp.einsum(
        "bhqe,bhke->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    )
    p = jnp.where(m, jnp.exp(jnp.clip(scores, -_CLIP, _CLIP)), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum(
        "bhqk,bhke->bhqe",
        p.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(l, 1e-30)
    return o.transpose(0, 2, 1, 3).reshape(b, n, d).astype(qkv.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _token_rows(qkv, cid, num_heads, max_clusters):
    return _token_rows_banded(qkv, cid, num_heads, max_clusters)


def _token_rows_fwd(qkv, cid, num_heads, max_clusters):
    return _token_rows_banded(qkv, cid, num_heads, max_clusters), (qkv, cid)


def _token_rows_bwd(num_heads, max_clusters, res, g):
    qkv, cid = res
    _, vjp = jax.vjp(
        lambda a: _token_rows_xla(a, cid, num_heads, max_clusters), qkv
    )
    return vjp(g)[0], None


_token_rows.defvjp(_token_rows_fwd, _token_rows_bwd)


def _prefix_rows(
    qkv: jnp.ndarray,
    cid: jnp.ndarray,
    n_clusters: jnp.ndarray,
    max_clusters: int,
    num_heads: int,
    mask_inf: float,
    output_rx_tx: bool,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """TX/RX rows, dense over all keys with the reference's exact soft
    additive mask — including the uniform-attention behavior of padded
    (invalid) slots that the dense path exhibits."""
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    c = max_clusters
    pfx = 2 * c
    x = qkv.reshape(b, s, 3, num_heads, dh)
    q = x[:, :pfx, 0].transpose(0, 2, 1, 3)  # [B, H, 2C, dh]
    k = x[:, :, 1].transpose(0, 2, 1, 3)  # [B, H, S, dh]
    v = x[:, :, 2].transpose(0, 2, 1, 3)

    nc = jnp.broadcast_to(jnp.asarray(n_clusters), (b,))
    cvalid = jnp.arange(c)[None] < nc[:, None]  # [B, C]
    rows = jnp.arange(pfx)
    is_tx = (rows % 2 == 0)[None, :, None]  # [1, 2C, 1]
    cols = jnp.arange(s)
    # TX_c → tokens of cluster c
    tok_of_c = (cols[None, None, :] >= pfx) & (
        jnp.pad(cid, ((0, 0), (pfx, 0)), constant_values=-1)[:, None, :]
        == (rows // 2)[None, :, None]
    )  # [B, 2C, S]
    # RX → every valid TX (row validity mirrors the dense mask build)
    col_is_tx = (cols < pfx) & (cols % 2 == 0)  # [S]
    col_valid = cvalid[:, jnp.clip(cols // 2, 0, c - 1)]  # [B, S]
    row_valid = cvalid[:, rows // 2]  # [B, 2C]
    rx_tx = (
        row_valid[:, :, None] & (col_is_tx[None, :] & col_valid)[:, None, :]
    )  # [B, 2C, S]
    m = jnp.where(is_tx, tok_of_c, rx_tx)[:, None]  # [B, 1, 2C, S]

    scores = jnp.einsum(
        "bhqe,bhke->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    )
    scores = scores - mask_inf * (1.0 - m.astype(jnp.float32))
    p = jnp.exp(jnp.clip(scores, -_CLIP, _CLIP))
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = (
        jnp.einsum(
            "bhqk,bhke->bhqe",
            p.astype(v.dtype),
            v,
            preferred_element_type=jnp.float32,
        )
        / l
    )
    out = o.transpose(0, 2, 1, 3).reshape(b, pfx, d).astype(qkv.dtype)
    rx_to_tx = None
    if output_rx_tx:
        probs = p / l  # [B, H, 2C, S]
        rx_to_tx = probs[:, :, 1::2, 0:pfx:2].astype(jnp.float32)
    return out, rx_to_tx


def multistate_banded_attention(
    qkv: jnp.ndarray,  # [B, 2C+N, 3D] fused-QKV output, q pre-scaled
    segments: BandedSegments,
    num_heads: int,
    output_rx_tx: bool = False,
) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Full multistate attention output [B, 2C+N, D] for a cluster-sorted
    sequence; optionally also the pooled RX→TX attention probabilities
    [B, H, C, C] (exact — the prefix rows are computed densely)."""
    seg = segments
    pfx_out, rx_to_tx = _prefix_rows(
        qkv,
        seg.cid,
        seg.n_clusters,
        seg.max_clusters,
        num_heads,
        seg.mask_inf,
        output_rx_tx,
    )
    tok_out = _token_rows(qkv, seg.cid, num_heads, seg.max_clusters)
    out = jnp.concatenate([pfx_out, tok_out], axis=1)
    if output_rx_tx:
        return out, rx_to_tx
    return out
