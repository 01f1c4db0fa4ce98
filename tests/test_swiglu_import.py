"""SwiGLU checkpoint import: DINOv2 with use_swiglu_ffn → our trunk."""

import numpy as np

import jax.numpy as jnp

from msvit_tpu.compat.hf_import import import_vit_params
from msvit_tpu.models.base import BaseViTConfig
from msvit_tpu.models.base.model import BaseViTEncoder
from msvit_tpu.settings import parity_policy


def test_swiglu_encoder_parity_vs_dinov2_giant_style():
    import torch
    from transformers import Dinov2Config, Dinov2Model

    torch.manual_seed(11)
    hf_cfg = Dinov2Config(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        mlp_ratio=4,
        use_swiglu_ffn=True,  # the dinov2-giant configuration
        image_size=32,
        patch_size=16,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layerscale_value=1.0,
        layer_norm_eps=1e-6,
        attn_implementation="eager",
    )
    hf = Dinov2Model(hf_cfg).eval()
    sd = hf.state_dict()

    cfg = BaseViTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        use_swiglu_ffn=True,
        image_size=32,
        patch_size=16,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    params = import_vit_params(sd, cfg)

    rng = np.random.default_rng(0)
    hidden = rng.standard_normal((2, 5, 64), dtype=np.float32)
    with torch.no_grad():
        ref = hf.encoder(torch.from_numpy(hidden)).last_hidden_state.numpy()
    enc = BaseViTEncoder(cfg)
    got, _, _ = enc.apply({"params": params["encoder"]}, jnp.asarray(hidden))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)
