"""Parity vs HF `Dinov2Model` (the reference's other checkpoint family —
`facebook/dinov2-base-imagenet1k-1-layer` via `modeling_ssvit.py:235-249`):
exercises the DINOv2 param aliases (norm1/norm2, mlp.fc1/fc2,
layer_scale.lambda1) and the layer-scale path of the trunk.

Note: HF Dinov2's own embeddings interpolate differently; parity here is
on the encoder stack given identical embedded inputs — the part every
family reuses."""

import numpy as np
import pytest

import jax.numpy as jnp

from msvit_tpu.models.base import BaseViTConfig
from msvit_tpu.models.base.model import BaseViTEncoder
from msvit_tpu.compat.hf_import import import_vit_params
from msvit_tpu.settings import parity_policy


def test_encoder_parity_vs_dinov2():
    import torch
    from transformers import Dinov2Config, Dinov2Model

    torch.manual_seed(7)
    hf_cfg = Dinov2Config(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        mlp_ratio=4,
        image_size=32,
        patch_size=16,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layerscale_value=1.0,
        layer_norm_eps=1e-6,
        attn_implementation="eager",
    )
    hf = Dinov2Model(hf_cfg).eval()
    # make layer scales non-trivial so the test actually covers them
    with torch.no_grad():
        for layer in hf.encoder.layer:
            layer.layer_scale1.lambda1.mul_(0.7)
            layer.layer_scale2.lambda1.mul_(1.3)
    sd = hf.state_dict()

    cfg = BaseViTConfig(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=32,
        patch_size=16,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    # Dinov2Model has no patch-projection-compatible embeddings for our
    # front end (different pos handling); import the encoder stack only.
    params = import_vit_params(
        {**sd,
         # satisfy the embedding keys the importer expects
         "embeddings.patch_embeddings.projection.weight": sd[
             "embeddings.patch_embeddings.projection.weight"
         ],
         "embeddings.patch_embeddings.projection.bias": sd[
             "embeddings.patch_embeddings.projection.bias"
         ],
         "layernorm.weight": sd["layernorm.weight"],
         "layernorm.bias": sd["layernorm.bias"]},
        cfg,
    )

    rng = np.random.default_rng(0)
    hidden = rng.standard_normal((2, 5, 64), dtype=np.float32)

    with torch.no_grad():
        ref = hf.encoder(torch.from_numpy(hidden)).last_hidden_state.numpy()

    enc = BaseViTEncoder(cfg)
    got, _, _ = enc.apply({"params": params["encoder"]}, jnp.asarray(hidden))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)
