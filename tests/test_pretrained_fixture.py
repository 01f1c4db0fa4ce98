"""Offline pretrained-weights oracle (VERDICT r2 item 6a).

The container has no network, so the real `facebook/dino-vitb8` download
can't run; this fixture closes every other step of the documented user
workflow: a randomly-initialized HF checkpoint is serialized to
**safetensors on disk** in hub layout (config.json + model.safetensors),
then loaded through the real `compat.pretrained` entry points —
exercising file parsing, config.json mapping, name mapping, fused-QKV
repack, position-table interpolation at a non-native resolution, and the
multistate bootstrap (reference workflow `sandbox/test.py:42-83`,
load path `modeling_msvitencoder.py:681-690`).  On a networked host the
only untested step left is the download itself
(`resolve_checkpoint` falls through to `hf_hub_download`).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msvit_tpu.compat import (
    config_from_hf,
    import_into_multistate,
    load_pretrained_vit,
    load_state_dict_from,
)
from msvit_tpu.models.base.vit import ViTModel
from msvit_tpu.settings import parity_policy


def _write_hf_fixture(tmpdir, hidden=64, layers=3, heads=4, image=32, patch=8):
    """Random HF ViTModel → hub-layout directory (safetensors+config)."""
    import torch
    from safetensors.torch import save_file
    from transformers import ViTConfig as HFViTConfig
    from transformers import ViTModel as HFViTModel

    torch.manual_seed(7)
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
    model = HFViTModel(hf_cfg, add_pooling_layer=False).eval()
    save_file(
        {k: v.contiguous() for k, v in model.state_dict().items()},
        os.path.join(tmpdir, "model.safetensors"),
    )
    with open(os.path.join(tmpdir, "config.json"), "w") as f:
        json.dump({**hf_cfg.to_dict(), "model_type": "vit"}, f)
    return model


def test_load_pretrained_vit_from_disk_matches_torch(tmp_path):
    """Full documented workflow from a file on disk: config derived from
    config.json, weights parsed from safetensors, features ≤1e-3 vs the
    torch model that wrote the checkpoint (the parity bar, applied to the
    *file* path rather than a live state_dict)."""
    import torch

    hf = _write_hf_fixture(str(tmp_path))
    cfg, params = load_pretrained_vit(str(tmp_path), policy=parity_policy())
    assert cfg.hidden_size == 64 and cfg.num_hidden_layers == 3
    assert cfg.patch_size == 8 and abs(cfg.mlp_ratio - 4.0) < 1e-9

    rng = np.random.default_rng(0)
    pix = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    model = ViTModel(cfg)
    got = model.apply(
        {"params": params}, jnp.asarray(pix)
    )["last_hidden_state"]
    with torch.no_grad():
        want = hf(
            torch.from_numpy(pix.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    assert np.max(np.abs(np.asarray(got) - want)) <= 1e-3


def test_pretrained_multistate_workflow_with_interpolation(tmp_path):
    """sandbox/test.py end-to-end from the on-disk checkpoint: bootstrap
    the multistate encoder (TX/RX from the CLS token) and run it at a
    NON-native resolution so the position table interpolates (the
    224/8=784-token trick of `sandbox/test.py:79`, scaled down for the
    1-core CPU host: table 4×4 → grid 8×8)."""
    from msvit_tpu.models.clustering import SpectralClusteringConfig
    from msvit_tpu.models.multistate import (
        MultiStateViTConfig,
        MultiStateViTEncoderModel,
    )

    _write_hf_fixture(str(tmp_path))
    sd = load_state_dict_from(str(tmp_path))

    cfg = MultiStateViTConfig(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
        pregeneration_period=2,
        generation_period=1,
        clustering=SpectralClusteringConfig(
            ncut_dim=4, num_sample=64, max_clusters=8
        ),
        policy=parity_policy(),
        attn_implementation="xla",
    )
    model = MultiStateViTEncoderModel(cfg)
    rng = jax.random.PRNGKey(0)
    pix64 = jax.random.normal(rng, (2, 64, 64, 3))  # 2× native → 64 tokens
    variables = model.init(
        {"params": rng, "clustering": rng}, pix64
    )
    params = import_into_multistate(sd, cfg, variables["params"])
    # TX/RX must equal the checkpoint's CLS token
    cls = np.asarray(sd["embeddings.cls_token"])[0, 0]
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["transmitter_token"]), cls, atol=1e-6
    )
    out = model.apply(
        {"params": params}, pix64, rngs={"clustering": jax.random.PRNGKey(3)}
    )
    lh = out["last_hidden_state"]
    assert lh.shape == (2, 64, 64)
    assert bool(jnp.isfinite(lh.astype(jnp.float32)).all())


def test_resolve_checkpoint_errors():
    with pytest.raises(FileNotFoundError):
        # not a local path; zero-egress container → clear error, no hang
        load_state_dict_from("facebook/does-not-exist-anywhere")


def test_config_from_hf_dinov2_fields():
    cfg = config_from_hf(
        {
            "model_type": "dinov2",
            "hidden_size": 96,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "image_size": 28,
            "patch_size": 14,
            "mlp_ratio": 4,
            "use_swiglu_ffn": True,
            "layerscale_value": 1e-5,
            "qkv_bias": True,
        }
    )
    assert cfg.use_swiglu_ffn and cfg.layerscale_value == 1e-5
    assert cfg.mlp_ratio == 4 and cfg.hidden_size == 96


def test_pretrained_predictive_and_subsample_bootstrap(tmp_path):
    """The other two family importers through the on-disk checkpoint:
    predictive (encoder + CLS only) and subsample (partial strict=False
    load), then one forward each to prove the loaded trees run."""
    from msvit_tpu.compat import import_into_predictive, import_into_subsample
    from msvit_tpu.models.predictive import (
        PredictiveViTConfig,
        PredictiveViTModel,
    )
    from msvit_tpu.models.subsample import (
        SubsampleViTConfig,
        SubsampleViTForImageClassification,
    )

    _write_hf_fixture(str(tmp_path))
    sd = load_state_dict_from(str(tmp_path))
    cls = np.asarray(sd["embeddings.cls_token"])[0, 0]
    rng = jax.random.PRNGKey(0)

    pcfg = PredictiveViTConfig(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=32,
        patch_size=16,
        max_context_length=3,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    pmodel = PredictiveViTModel(pcfg)
    pix = jax.random.normal(rng, (2, 32, 32, 3))
    pvars = pmodel.init({"params": rng, "glimpse": rng}, pix)
    pparams = import_into_predictive(sd, pcfg, pvars["params"])
    np.testing.assert_allclose(np.asarray(pparams["cls_token"]), cls, atol=1e-6)
    pout = pmodel.apply(
        {"params": pparams}, pix, rngs={"glimpse": jax.random.PRNGKey(1)}
    )
    assert all(
        bool(jnp.isfinite(v.astype(jnp.float32)).all())
        for v in jax.tree.leaves(pout)
    )

    scfg = SubsampleViTConfig(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
        initial_grid_size=2,
        max_depth=1,
        num_labels=5,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    smodel = SubsampleViTForImageClassification(scfg)
    labels = jnp.zeros((2,), jnp.int32)
    svars = smodel.init({"params": rng, "policy": rng}, pix, labels)
    sparams = import_into_subsample(sd, scfg, svars["params"])
    got_cls = np.asarray(sparams["model"]["cls_token"]).reshape(-1)
    np.testing.assert_allclose(got_cls, cls, atol=1e-6)
    sout = smodel.apply(
        {"params": sparams}, pix, labels, rngs={"policy": jax.random.PRNGKey(2)}
    )
    assert bool(
        jnp.isfinite(sout["classifier_logits"].astype(jnp.float32)).all()
    )
