"""Semantic integration test: the multistate encoder's spectral clustering
discovers real image structure — a two-region image must split into
exactly the two regions (this is the behavior `sandbox/test.py` inspects
visually; here it's an assertion)."""

import numpy as np

import jax
import jax.numpy as jnp

from msvit_tpu.models.clustering import SpectralClusteringConfig
from msvit_tpu.models.multistate import (
    MultiStateViTConfig,
    MultiStateViTEncoderModel,
)
from msvit_tpu.settings import parity_policy


def test_two_region_image_clusters_into_two_regions():
    cfg = MultiStateViTConfig(
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=4,
        image_size=64,
        patch_size=8,
        pregeneration_period=2,
        generation_period=2,
        clustering=SpectralClusteringConfig(
            ncut_dim=4,
            num_sample=128,
            max_clusters=8,
            eigenvalue_threshold=0.05,
            ncut_dist="rbf",
        ),
        policy=parity_policy(),
        attn_implementation="xla",
    )
    model = MultiStateViTEncoderModel(cfg)

    rng = np.random.default_rng(0)
    img = np.zeros((2, 64, 64, 3), np.float32)
    img[:, :, :32] = 1.0 + 0.1 * rng.standard_normal((2, 64, 32, 3))
    img[:, :, 32:] = -1.0 + 0.1 * rng.standard_normal((2, 64, 32, 3))
    pix = jnp.asarray(img)

    variables = model.init(
        {"params": jax.random.PRNGKey(1), "clustering": jax.random.PRNGKey(2)},
        pix[:1],
    )
    out = model.apply(
        variables,
        pix,
        rngs={"clustering": jax.random.PRNGKey(3)},
        output_cluster_indices=True,
    )

    assert int(out["num_clusters"]) == 2
    ci = np.asarray(out["last_cluster_indices"])  # [B, 64] on an 8×8 grid
    for b in range(2):
        grid = ci[b].reshape(8, 8)
        left, right = grid[:, :4], grid[:, 4:]
        # each half is one uniform cluster, and they differ
        assert (left == left[0, 0]).all()
        assert (right == right[0, 0]).all()
        assert left[0, 0] != right[0, 0]
