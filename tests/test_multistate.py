"""Multistate encoder tests (SURVEY §4 (c)): mask block structure vs a
golden port of the reference's `_construct_attention_mask`, backbone
forward invariants, TX/RX duplication math, and the experimental
least-squares compression."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msvit_tpu.models.clustering import SpectralClusteringConfig
from msvit_tpu.models.multistate import (
    MultiStateViTConfig,
    MultiStateViTEncoderBackbone,
    MultiStateViTEncoderModel,
    build_multistate_attention_mask,
)
from msvit_tpu.settings import parity_policy


def _golden_mask(cluster_indices: np.ndarray, max_n_clusters: int) -> np.ndarray:
    """Direct numpy port of the reference mask semantics
    (`modeling_msvitencoder.py:427-467`) with the cluster axis padded to
    max_n_clusters and per-batch n_clusters = max(ci)+1."""
    bsz, n = cluster_indices.shape
    c = max_n_clusters
    n_clusters = cluster_indices.max(axis=1) + 1
    total = 2 * c + n
    mask = np.zeros((bsz, total, total), bool)
    for b in range(bsz):
        ci = cluster_indices[b]
        for q in range(n):
            for k in range(n):
                if ci[q] == ci[k]:
                    mask[b, 2 * c + q, 2 * c + k] = True
        for cc in range(c):
            for t in range(n):
                if ci[t] == cc:
                    mask[b, 2 * cc, 2 * c + t] = True  # TX -> cluster
                    mask[b, 2 * c + t, 2 * cc + 1] = True  # cluster -> RX
        for r in range(n_clusters[b]):
            for t in range(n_clusters[b]):
                mask[b, 2 * r + 1, 2 * t] = True  # RX -> TX
    return mask


def test_mask_matches_reference_semantics():
    rng = np.random.default_rng(0)
    ci = rng.integers(0, 3, (2, 10)).astype(np.int32)
    ci[:, 0] = 2  # ensure 3 clusters present in each row
    got = build_multistate_attention_mask(
        jnp.asarray(ci), jnp.asarray(ci.max(axis=1) + 1), max_clusters=5
    )
    want = _golden_mask(ci, 5)
    np.testing.assert_array_equal(np.asarray(got[:, 0]), want)


def _cfg(**kw):
    base = dict(
        hidden_size=32,
        num_hidden_layers=6,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
        pregeneration_period=2,
        generation_period=2,
        attention_mask_inf=1e2,
        clustering=SpectralClusteringConfig(
            ncut_dim=4,
            num_sample=64,
            max_clusters=8,
            eigenvalue_threshold=0.1,
            ncut_dist="rbf",
        ),
        policy=parity_policy(),
        attn_implementation="xla",
    )
    base.update(kw)
    return MultiStateViTConfig(**base)


def test_backbone_forward_invariants():
    cfg = _cfg()
    backbone = MultiStateViTEncoderBackbone(cfg)
    h = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    variables = backbone.init(
        {"params": jax.random.PRNGKey(1), "clustering": jax.random.PRNGKey(2)}, h
    )
    out = backbone.apply(
        variables,
        h,
        rngs={"clustering": jax.random.PRNGKey(3)},
        output_cluster_indices=True,
        output_attentions=True,
    )
    c = cfg.max_clusters
    assert out["last_hidden_state"].shape == (2, 16, 32)
    assert out["last_cluster_tokens"].shape == (2, c, 2, 32)
    assert out["last_receiver_to_transmitter_attentions"].shape == (2, 4, c, c)
    nc = int(out["num_clusters"])
    assert 1 <= nc <= c
    ci = np.asarray(out["last_cluster_indices"])
    assert ci.min() >= 0 and ci.max() < c
    # clustering happened at layers 2 and 4 → more than one cluster almost
    # surely with random features; at minimum ids stay in range
    assert bool(jnp.isfinite(out["last_hidden_state"]).all())
    # attention sub-blocks are slices of a softmax → row sums in (0, 1]
    intra = out["intracluster_attentions"][-1]  # [B, H, N, N]
    row_sums = np.asarray(jnp.sum(intra, axis=-1))
    assert row_sums.max() <= 1.0 + 1e-5
    assert row_sums.min() > 0.0


def test_tx_rx_duplication_by_searchsorted():
    """Children inherit their parent's TX/RX tokens
    (reference `modeling_msvitencoder.py:494-502`)."""
    n_children = jnp.asarray([2, 3, 0, 0], jnp.int32)
    cum = jnp.cumsum(n_children)
    parent_of = jnp.searchsorted(cum, jnp.arange(4), side="right")
    np.testing.assert_array_equal(np.asarray(parent_of), [0, 0, 1, 1])


def test_full_model_runs():
    cfg = _cfg()
    model = MultiStateViTEncoderModel(cfg)
    pix = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "clustering": jax.random.PRNGKey(2)},
        pix,
    )
    out = model.apply(
        variables, pix, rngs={"clustering": jax.random.PRNGKey(3)}
    )
    assert out["cluster_tokens"].shape == (2, cfg.max_clusters, 32)
    assert out["receiver_to_transmitter_attentions"].shape[0] == 2


def test_compress_tokens_experimental():
    from msvit_tpu.models.multistate import compress_tokens_with_cluster_indices

    b, h, n, dh, d, c = 1, 2, 6, 4, 8, 2
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (b, h, n, dh))
    kw = jax.random.normal(ks[1], (d, h, dh)) * 0.1
    kb = jnp.zeros((h, dh))
    probs = jax.nn.softmax(jax.random.normal(ks[2], (b, h, n, n)), axis=-1)
    ci = jnp.asarray([[0, 0, 1, 1, 0, 1]], jnp.int32)
    tx = compress_tokens_with_cluster_indices(q, kw, kb, probs, ci, c, dh)
    assert tx.shape == (b, c, d)
    assert bool(jnp.isfinite(tx).all())


def test_classification_finetune_decreases_loss():
    """examples/train_multistate.py semantics: frozen trunk, trainable
    TX/RX tokens + classifier head, loss decreases."""
    import optax

    from msvit_tpu.models.multistate import MultiStateViTForImageClassification
    from msvit_tpu.train.loop import make_optimizer

    cfg = _cfg()
    model = MultiStateViTForImageClassification(cfg, num_labels=4)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (4, cfg.image_size, cfg.image_size, 3))
    labels = jnp.asarray([0, 1, 2, 3])
    params = model.init({"params": rng, "clustering": rng}, pix, labels)

    trainable = lambda path: any(  # noqa: E731
        n in ("transmitter_token", "receiver_token", "classifier")
        for n in path
    )
    opt = make_optimizer(5e-2, trainable=trainable)
    state = opt.init(params)
    frozen_before = jax.tree.leaves(
        params["params"]["encoder"]["embeddings"]
    )[0]

    @jax.jit
    def step(params, state, key):
        def loss_fn(p):
            out = model.apply(p, pix, labels, rng=key)
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for i in range(6):
        params, state, loss = step(params, state, jax.random.PRNGKey(7))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # trunk params stayed frozen
    frozen_after = jax.tree.leaves(
        params["params"]["encoder"]["embeddings"]
    )[0]
    np.testing.assert_array_equal(
        np.asarray(frozen_before), np.asarray(frozen_after)
    )
