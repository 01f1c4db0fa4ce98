"""Head pruning vs HF `ViTModel.prune_heads` (reference
`modeling_base.py:183-219` uses the identical HF machinery).

* surgery mode: uniform per-layer pruning → smaller params + config;
  outputs match the HF-pruned model.
* masked mode: arbitrary per-layer head sets, shapes unchanged; outputs
  match the HF-pruned model exactly (a zeroed head contributes zero).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from msvit_tpu.compat import import_vit_params
from msvit_tpu.models.base import BaseViTConfig, ViTModel
from msvit_tpu.models.base.pruning import prune_heads, prune_heads_masked
from msvit_tpu.settings import parity_policy

torch = pytest.importorskip("torch")


def _pair(hidden=64, layers=3, heads=4, image=32, patch=16):
    from transformers import ViTConfig as HFViTConfig
    from transformers import ViTModel as HFViTModel

    torch.manual_seed(7)
    hf = HFViTModel(
        HFViTConfig(
            hidden_size=hidden,
            num_hidden_layers=layers,
            num_attention_heads=heads,
            intermediate_size=hidden * 4,
            image_size=image,
            patch_size=patch,
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
            layer_norm_eps=1e-6,
            attn_implementation="eager",
        ),
        add_pooling_layer=False,
    )
    hf.eval()
    cfg = BaseViTConfig(
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        mlp_ratio=4.0,
        image_size=image,
        patch_size=patch,
        layerscale_value=1.0,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    params = import_vit_params(hf.state_dict(), cfg, add_cls_token=True)
    return hf, cfg, params


def _forward(cfg, params, pix):
    out = ViTModel(cfg).apply(
        {"params": params}, jnp.asarray(pix.transpose(0, 2, 3, 1))
    )["last_hidden_state"]
    return np.asarray(out)


def test_prune_heads_surgery_matches_hf():
    hf, cfg, params = _pair()
    heads = {0: [1], 1: [3], 2: [0]}  # one head per layer (uniform count)
    hf.prune_heads(heads)
    pruned_params, pruned_cfg = prune_heads(params, cfg, heads)
    assert pruned_cfg.num_attention_heads == 3
    assert pruned_cfg.head_dim == 16  # original per-head size survives
    enc = pruned_params["encoder"]
    assert enc["layer_0"]["attention"]["qkv_kernel"].shape == (64, 3, 3, 16)
    assert enc["layer_0"]["attention"]["output_dense"]["kernel"].shape == (48, 64)

    rng = np.random.default_rng(0)
    pix = rng.standard_normal((2, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(pix)).last_hidden_state.numpy()
    got = _forward(pruned_cfg, pruned_params, pix)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_prune_heads_masked_matches_hf_nonuniform():
    hf, cfg, params = _pair()
    heads = {0: [1, 2], 2: [3]}  # non-uniform: the general HF contract
    hf.prune_heads(heads)
    masked = prune_heads_masked(params, heads)

    rng = np.random.default_rng(1)
    pix = rng.standard_normal((2, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(pix)).last_hidden_state.numpy()
    got = _forward(cfg, masked, pix)  # same config: shapes unchanged
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_surgery_rejects_nonuniform():
    _, cfg, params = _pair()
    with pytest.raises(ValueError, match="masked"):
        prune_heads(params, cfg, {0: [1, 2], 2: [3]})


def test_prune_nothing_is_identity():
    _, cfg, params = _pair()
    same_params, same_cfg = prune_heads(params, cfg, {0: []})
    assert same_cfg is cfg
    out = prune_heads_masked(params, {1: []})
    a = params["encoder"]["layer_1"]["attention"]["qkv_kernel"]
    b = out["encoder"]["layer_1"]["attention"]["qkv_kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
