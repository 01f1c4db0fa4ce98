"""Numerical parity of the base ViT trunk against HF `transformers.ViTModel`
on CPU with identical (randomly initialized) weights — the BASELINE.json
bar: ≤1e-3 max deviation of output features (SURVEY §4 test strategy (b)).

No network access: HF models are constructed locally with random init.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from msvit_tpu.models.base import BaseViTConfig, ViTModel
from msvit_tpu.compat import import_vit_params
from msvit_tpu.settings import parity_policy


def _hf_vit(hidden, layers, heads, intermediate, image, patch):
    import torch
    from transformers import ViTConfig as HFViTConfig
    from transformers import ViTModel as HFViTModel

    torch.manual_seed(1212)
    hf_cfg = HFViTConfig(
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        intermediate_size=intermediate,
        image_size=image,
        patch_size=patch,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-6,
        attn_implementation="eager",
    )
    model = HFViTModel(hf_cfg, add_pooling_layer=False)
    model.eval()
    return model


@pytest.mark.parametrize(
    "hidden,layers,heads,image,patch",
    [
        (64, 3, 4, 32, 16),  # quick
        (768, 12, 12, 224, 16),  # ViT-B/16 — the BASELINE.json config
    ],
)
def test_vit_parity_vs_hf(hidden, layers, heads, image, patch):
    import torch

    hf = _hf_vit(hidden, layers, heads, hidden * 4, image, patch)
    sd = hf.state_dict()

    cfg = BaseViTConfig(
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        mlp_ratio=4.0,
        image_size=image,
        patch_size=patch,
        layerscale_value=1.0,  # identity: plain HF ViT has no layer scale
        policy=parity_policy(),
        attn_implementation="xla",
    )
    params = import_vit_params(sd, cfg, add_cls_token=True)

    rng = np.random.default_rng(0)
    pix = rng.standard_normal((2, 3, image, image), dtype=np.float32)

    with torch.no_grad():
        ref = hf(torch.from_numpy(pix)).last_hidden_state.numpy()

    model = ViTModel(cfg)
    out = model.apply(
        {"params": params}, jnp.asarray(pix.transpose(0, 2, 3, 1))
    )["last_hidden_state"]
    got = np.asarray(out)

    assert got.shape == ref.shape
    err = np.max(np.abs(got - ref))
    assert err <= 1e-3, f"max deviation {err} > 1e-3"


def test_context_states_concat_semantics():
    """K/V see [hidden ++ context], queries only hidden
    (reference `modeling_base.py:77-82`): attention with context must equal
    attention over the concatenated sequence restricted to hidden queries."""
    import jax

    cfg = BaseViTConfig(
        hidden_size=32,
        num_hidden_layers=1,
        num_attention_heads=4,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    from msvit_tpu.models.base.model import BaseViTSelfAttention

    attn = BaseViTSelfAttention(cfg)
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (2, 5, 32))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32))
    params = attn.init(jax.random.PRNGKey(2), h)

    out_ctx, _ = attn.apply(params, h, context_states=c)
    full = jnp.concatenate([h, c], axis=1)
    out_full, _ = attn.apply(params, full)
    np.testing.assert_allclose(
        np.asarray(out_ctx), np.asarray(out_full[:, :5]), atol=1e-5
    )


def test_bool_and_additive_masks_agree():
    """bool mask (True=attend) ≡ additive −inf-style mask
    (reference `modeling_base.py:89-93`)."""
    import jax

    cfg = BaseViTConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    from msvit_tpu.models.base.model import BaseViTEncoder

    enc = BaseViTEncoder(cfg)
    h = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32))
    bool_mask = jax.random.bernoulli(jax.random.PRNGKey(1), 0.7, (2, 1, 6, 6))
    bool_mask = bool_mask | jnp.eye(6, dtype=bool)  # keep rows nonempty
    add_mask = jnp.where(bool_mask, 0.0, -1e30).astype(jnp.float32)

    params = enc.init(jax.random.PRNGKey(2), h)
    out_b, _, _ = enc.apply(params, h, attention_mask=bool_mask)
    out_a, _, _ = enc.apply(params, h, attention_mask=add_mask)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a), atol=1e-5)
