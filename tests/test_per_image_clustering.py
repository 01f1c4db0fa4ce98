"""Per-image clustering mode (pool_batch=False) — independent cluster ids
per batch element — and the multistate backbone handling per-image child
counts; plus classifier-head parity vs HF ViTForImageClassification."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msvit_tpu.models.clustering import SpectralClusteringConfig, spectral_cluster
from msvit_tpu.models.multistate import (
    MultiStateViTConfig,
    MultiStateViTEncoderBackbone,
)
from msvit_tpu.settings import parity_policy


def _blob_tokens(key, b, n, d, n_blobs):
    """Tokens drawn from separated blobs, different layout per image."""
    rng = np.random.default_rng(int(key))
    x = np.zeros((b, n, d), np.float32)
    for i in range(b):
        centers = rng.standard_normal((n_blobs, d)) * 10.0
        labels = rng.integers(0, n_blobs, n)
        x[i] = centers[labels] + rng.standard_normal((n, d)) * 0.3
    return jnp.asarray(x)


def test_per_image_spectral_counts():
    cfg = SpectralClusteringConfig(
        ncut_dim=4,
        num_sample=64,
        max_clusters=8,
        eigenvalue_threshold=0.2,
        pool_batch=False,
    )
    x = _blob_tokens(0, 3, 48, 8, n_blobs=2)
    parents = jnp.zeros((3, 48), jnp.int32)
    child, n_children = spectral_cluster(cfg, parents, x, jax.random.PRNGKey(0))
    assert child.shape == (3, 48)
    assert n_children.shape == (3, 8)  # per-image counts
    # ids are per-image local: every image starts its ids at 0
    assert (np.asarray(child).min(axis=1) == 0).all()
    # all children come from the single root parent
    assert (np.asarray(n_children)[:, 1:] == 0).all()
    assert (np.asarray(n_children)[:, 0] >= 1).all()


def test_multistate_backbone_per_image_mode():
    cfg = MultiStateViTConfig(
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=4,
        pregeneration_period=2,
        generation_period=2,
        clustering=SpectralClusteringConfig(
            ncut_dim=4,
            num_sample=64,
            max_clusters=8,
            eigenvalue_threshold=0.1,
            pool_batch=False,
        ),
        policy=parity_policy(),
        attn_implementation="xla",
    )
    backbone = MultiStateViTEncoderBackbone(cfg)
    h = jax.random.normal(jax.random.PRNGKey(0), (3, 16, 32))
    variables = backbone.init(
        {"params": jax.random.PRNGKey(1), "clustering": jax.random.PRNGKey(2)}, h
    )
    out = backbone.apply(
        variables, h, rngs={"clustering": jax.random.PRNGKey(3)}
    )
    assert out["num_clusters"].shape == (3,)  # per-image cluster counts
    assert bool((out["num_clusters"] >= 1).all())
    assert bool(jnp.isfinite(out["last_hidden_state"]).all())


def test_classifier_parity_vs_hf():
    import torch
    from transformers import ViTConfig as HFViTConfig
    from transformers import ViTForImageClassification as HFViTCls

    from msvit_tpu.compat import import_vit_params
    from msvit_tpu.models.base import BaseViTConfig
    from msvit_tpu.models.base.vit import ViTForImageClassification

    torch.manual_seed(3)
    hf_cfg = HFViTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=256,
        image_size=32,
        patch_size=16,
        num_labels=7,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-6,
        attn_implementation="eager",
    )
    hf = HFViTCls(hf_cfg).eval()
    sd = hf.state_dict()  # keys already carry the "vit." prefix

    cfg = BaseViTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=16,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    trunk = import_vit_params(sd, cfg, prefix="vit.")
    params = {
        "vit": trunk,
        "classifier": {
            "kernel": np.asarray(hf.classifier.weight.detach()).T,
            "bias": np.asarray(hf.classifier.bias.detach()),
        },
    }
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((2, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(pix)).logits.numpy()
    model = ViTForImageClassification(cfg, num_labels=7)
    got = model.apply({"params": params}, jnp.asarray(pix.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)