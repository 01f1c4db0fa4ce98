"""Flax→flax multistate bootstrap (`transfer_base_to_multistate`):
transferring a framework-trained `ViTModel` param tree into the
multistate encoder must equal the HF-state-dict import path
(`import_into_multistate`) applied to the same checkpoint — the two
routes to the reference's pretrained load
(`modeling_msvitencoder.py:681-690`) must agree exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from msvit_tpu.compat.family_import import (
    import_into_multistate,
    transfer_base_to_multistate,
)
from msvit_tpu.compat.hf_import import import_vit_params
from msvit_tpu.models.clustering import SpectralClusteringConfig
from msvit_tpu.models.multistate import (
    MultiStateViTConfig,
    MultiStateViTEncoderModel,
)
from msvit_tpu.settings import parity_policy


def _hf_state_dict(hidden=64, layers=3, heads=4, image=32, patch=8):
    from transformers import ViTConfig as HFViTConfig
    from transformers import ViTModel as HFViTModel

    torch.manual_seed(11)
    hf_cfg = HFViTConfig(
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
    )
    return HFViTModel(hf_cfg, add_pooling_layer=False).eval().state_dict()


def _ms_cfg(**kw):
    base = dict(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
        pregeneration_period=2,
        generation_period=1,
        clustering=SpectralClusteringConfig(
            ncut_dim=4, num_sample=16, max_clusters=4
        ),
        policy=parity_policy(),
        attn_implementation="xla",
    )
    base.update(kw)
    return MultiStateViTConfig(**base)


def test_transfer_equals_hf_import_path():
    sd = _hf_state_dict()
    cfg = _ms_cfg()
    model = MultiStateViTEncoderModel(cfg)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (1, 32, 32, 3))
    init = model.init({"params": rng, "clustering": rng}, pix)["params"]

    want = import_into_multistate(sd, cfg, init)
    base_params = import_vit_params(sd, cfg, add_cls_token=True)
    got = transfer_base_to_multistate(base_params, init, cfg.num_hidden_layers)

    flat_w = jax.tree_util.tree_leaves_with_path(want)
    flat_g = dict(jax.tree_util.tree_leaves_with_path(got))
    assert set(flat_g) == {p for p, _ in flat_w}
    for path, w in flat_w:
        np.testing.assert_allclose(
            np.asarray(flat_g[path], np.float32),
            np.asarray(w, np.float32),
            atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )

    # the transferred model must run
    out = MultiStateViTEncoderModel(cfg).apply(
        {"params": got}, pix, rngs={"clustering": jax.random.PRNGKey(1)}
    )
    assert bool(jnp.isfinite(out["last_hidden_state"]).all())

    # regression: TX/RX must be DISTINCT buffers — both bootstrap paths
    # once aliased one array into both slots, which a donating train
    # step rejects (double donation, INVALID_ARGUMENT on TPU)
    for tree in (got, want):
        bb = tree["backbone"]
        assert bb["transmitter_token"] is not bb["receiver_token"]


def test_transfer_interpolates_position_table():
    """Base trained at 32px/patch8 (4×4 grid), multistate at 64px/patch8
    (8×8 grid): the position table must be resampled, everything else
    copied."""
    sd = _hf_state_dict()
    cfg64 = _ms_cfg(image_size=64)
    model = MultiStateViTEncoderModel(cfg64)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (1, 64, 64, 3))
    init = model.init({"params": rng, "clustering": rng}, pix)["params"]

    base_params = import_vit_params(
        sd, _ms_cfg(), add_cls_token=True
    )
    got = transfer_base_to_multistate(base_params, init, 3)
    assert got["embeddings"]["position_embeddings"].shape == (1, 64, 64)
    out = model.apply(
        {"params": got}, pix, rngs={"clustering": jax.random.PRNGKey(1)}
    )
    assert out["last_hidden_state"].shape == (1, 64, 64)
