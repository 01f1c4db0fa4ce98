"""Cluster-banded multistate attention (ops/banded_attention.py):

* the banded Pallas kernel (interpret mode on CPU) must match the XLA
  oracle with identical dropped-leak semantics on the token rows;
* the full op (prefix + token rows) must match the dense soft-masked
  path built from `build_multistate_attention_mask` — the documented
  deviation (dropped e^{-80} leaks) is far below test tolerance;
* the custom-VJP gradient must match differentiating the XLA oracle;
* the banded multistate model must match the dense model end to end
  (same params, same clustering rng ⇒ identical cluster assignments,
  matching hidden states).
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from msvit_tpu.ops.banded_attention import (
    _band_limits,
    _token_rows,
    _token_rows_banded,
    _token_rows_xla,
    BandedSegments,
    multistate_banded_attention,
)
from msvit_tpu.models.multistate import build_multistate_attention_mask


def _sorted_cid(sizes, n):
    out = np.concatenate([np.full(s, i) for i, s in enumerate(sizes)])
    assert len(out) == n
    return out.astype(np.int32)


def _rand_case(key, b=2, c=4, n=24, heads=2, dh=8):
    d = heads * dh
    s = 2 * c + n
    qkv = jax.random.normal(key, (b, s, 3 * d), jnp.float32)
    cid = np.stack(
        [_sorted_cid([10, 2, 12], n), _sorted_cid([1, 15, 8], n)]
    )[:b]
    return qkv, jnp.asarray(cid), c, heads


def test_band_limits_blocks():
    sizes = [150, 100, 50]
    cid = jnp.asarray(_sorted_cid(sizes, 300))[None]
    kmm = np.asarray(_band_limits(cid, max_clusters=4, n_qblocks=3))[0]
    # qb0: all cluster 0 → keys [0,150) → blocks 0..1
    # qb1: clusters 0..2 → keys [0,300) → blocks 0..2
    # qb2: cluster 2 only → keys [250,300) → blocks 1..2
    np.testing.assert_array_equal(kmm[0], [0, 0, 1])
    np.testing.assert_array_equal(kmm[1], [1, 2, 2])


def test_token_rows_kernel_matches_xla_oracle():
    qkv, cid, c, heads = _rand_case(jax.random.PRNGKey(0))
    got = _token_rows_banded(qkv, cid, heads, c)
    want = _token_rows_xla(qkv, cid, heads, c)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_token_rows_multiblock_band():
    """N > 128 so the kernel actually skips key blocks (uneven clusters
    spanning block boundaries)."""
    heads, dh, c = 2, 8, 4
    d = heads * dh
    n = 300
    qkv = jax.random.normal(
        jax.random.PRNGKey(5), (1, 2 * c + n, 3 * d), jnp.float32
    )
    cid = jnp.asarray(_sorted_cid([150, 100, 50], n))[None]
    got = _token_rows_banded(qkv, cid, heads, c)
    want = _token_rows_xla(qkv, cid, heads, c)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_token_rows_multichunk_gating():
    """N > 1024 exercises the multi-chunk path: whole dead key chunks
    are pl.when-skipped and contributions accumulate in scratch."""
    heads, dh, c = 2, 8, 4
    d = heads * dh
    n = 1200  # n_pad 1280 → 10 key blocks → 2 chunks
    qkv = jax.random.normal(
        jax.random.PRNGKey(6), (1, 2 * c + n, 3 * d), jnp.float32
    )
    cid = jnp.asarray(_sorted_cid([500, 400, 200, 100], n))[None]
    got = _token_rows_banded(qkv, cid, heads, c)
    want = _token_rows_xla(qkv, cid, heads, c)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )


def test_full_op_matches_dense_soft_mask():
    qkv, cid, c, heads = _rand_case(jax.random.PRNGKey(1))
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    n = s - 2 * c
    n_clusters = cid.max(axis=1) + 1

    got = multistate_banded_attention(
        qkv,
        BandedSegments(
            cid=cid, n_clusters=n_clusters, max_clusters=c, mask_inf=1e2
        ),
        heads,
    )

    # dense oracle: full soft-masked shaved softmax over all rows
    mask = build_multistate_attention_mask(cid, n_clusters, c)  # [B,1,S,S]
    x = qkv.reshape(b, s, 3, heads, dh)
    q, k, v = (x[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    scores = jnp.einsum("bhqe,bhke->bhqk", q, k)
    scores = scores - 1e2 * (1.0 - mask.astype(jnp.float32))
    p = jnp.exp(jnp.clip(scores, -80.0, 80.0))
    o = jnp.einsum("bhqk,bhke->bhqe", p, v) / jnp.sum(
        p, axis=-1, keepdims=True
    )
    want = o.transpose(0, 2, 1, 3).reshape(b, s, d)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )


def test_rx_tx_probs_match_dense():
    qkv, cid, c, heads = _rand_case(jax.random.PRNGKey(2))
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    n_clusters = cid.max(axis=1) + 1
    _, rx_tx = multistate_banded_attention(
        qkv,
        BandedSegments(
            cid=cid, n_clusters=n_clusters, max_clusters=c, mask_inf=1e2
        ),
        heads,
        output_rx_tx=True,
    )
    mask = build_multistate_attention_mask(cid, n_clusters, c)
    x = qkv.reshape(b, s, 3, heads, dh)
    q, k, _ = (x[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    scores = jnp.einsum("bhqe,bhke->bhqk", q, k)
    scores = scores - 1e2 * (1.0 - mask.astype(jnp.float32))
    p = jnp.exp(jnp.clip(scores, -80.0, 80.0))
    probs = p / jnp.sum(p, axis=-1, keepdims=True)
    want = probs[:, :, 1 : 2 * c : 2, 0 : 2 * c : 2]
    np.testing.assert_allclose(
        np.asarray(rx_tx), np.asarray(want), atol=1e-5, rtol=1e-4
    )


def test_grad_matches_xla_oracle():
    qkv, cid, c, heads = _rand_case(jax.random.PRNGKey(3))
    out_shape = _token_rows_xla(qkv, cid, heads, c).shape
    w = jax.random.normal(jax.random.PRNGKey(4), out_shape)

    g_banded = jax.grad(
        lambda a: jnp.sum(_token_rows(a, cid, heads, c) * w)
    )(qkv)
    g_xla = jax.grad(
        lambda a: jnp.sum(_token_rows_xla(a, cid, heads, c) * w)
    )(qkv)
    np.testing.assert_allclose(
        np.asarray(g_banded), np.asarray(g_xla), atol=1e-5, rtol=1e-4
    )


def _model_cfg(banded: bool):
    from msvit_tpu.models.clustering import SpectralClusteringConfig
    from msvit_tpu.models.multistate import MultiStateViTConfig
    from msvit_tpu.settings import parity_policy

    return MultiStateViTConfig(
        hidden_size=32,
        num_hidden_layers=6,
        num_attention_heads=2,
        image_size=32,
        patch_size=8,
        pregeneration_period=2,
        generation_period=2,
        attention_mask_inf=1e2,
        clustering=SpectralClusteringConfig(
            ncut_dim=4,
            num_sample=16,
            max_clusters=4,
            eigenvalue_threshold=0.1,
            ncut_dist="rbf",
        ),
        policy=parity_policy(),
        attn_implementation="xla",
        banded_attention=banded,
    )


def test_model_banded_matches_dense():
    from msvit_tpu.models.multistate import MultiStateViTEncoderModel

    cfg_d = _model_cfg(False)
    cfg_b = _model_cfg(True)
    pix = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    rngs = {"params": jax.random.PRNGKey(1), "clustering": jax.random.PRNGKey(2)}
    params = MultiStateViTEncoderModel(cfg_d).init(rngs, pix)

    kw = dict(
        rngs={"clustering": jax.random.PRNGKey(3)},
        output_cluster_indices=True,
        output_hidden_states=True,
    )
    out_d = MultiStateViTEncoderModel(cfg_d).apply(params, pix, **kw)
    out_b = MultiStateViTEncoderModel(cfg_b).apply(params, pix, **kw)

    # identical clustering decisions (same rng, original-order anchors)
    np.testing.assert_array_equal(
        np.asarray(out_d["last_cluster_indices"]),
        np.asarray(out_b["last_cluster_indices"]),
    )
    assert int(out_d["num_clusters"]) == int(out_b["num_clusters"])
    np.testing.assert_allclose(
        np.asarray(out_d["last_hidden_state"]),
        np.asarray(out_b["last_hidden_state"]),
        atol=5e-4,
        rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_d["last_cluster_tokens"]),
        np.asarray(out_b["last_cluster_tokens"]),
        atol=5e-4,
        rtol=1e-3,
    )
    # pooled RX→TX attentions (last layer runs dense in banded mode)
    np.testing.assert_allclose(
        np.asarray(out_d["last_receiver_to_transmitter_attentions"]),
        np.asarray(out_b["last_receiver_to_transmitter_attentions"]),
        atol=5e-4,
    )
    # per-layer collected hidden states are unsorted back to token order
    for hd, hb in zip(out_d["hidden_states"], out_b["hidden_states"]):
        np.testing.assert_allclose(
            np.asarray(hd), np.asarray(hb), atol=5e-4, rtol=1e-3
        )


def test_model_banded_ignored_under_output_attentions():
    from msvit_tpu.models.multistate import MultiStateViTEncoderModel

    cfg_b = _model_cfg(True)
    pix = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    rngs = {"params": jax.random.PRNGKey(1), "clustering": jax.random.PRNGKey(2)}
    params = MultiStateViTEncoderModel(cfg_b).init(rngs, pix)
    out = MultiStateViTEncoderModel(cfg_b).apply(
        params,
        pix,
        rngs={"clustering": jax.random.PRNGKey(3)},
        output_attentions=True,
    )
    assert out["intracluster_attentions"] is not None
    assert bool(jnp.isfinite(out["last_hidden_state"]).all())
