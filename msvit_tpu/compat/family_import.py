"""Wire imported HF trunk weights into each encoder family's param tree —
the counterpart of the reference's per-family pretrained bootstrap:

* multistate: embeddings + per-layer trunk weights, TX/RX initialized from
  the pretrained CLS token (`modeling_msvitencoder.py:681-690`; upstream's
  `.encoder.blocks` AttributeError fixed per SURVEY §7);
* predictive: encoder weights + CLS token only (`modeling_spvitencoder.py:
  498-509` — embeddings are its own glimpse tokenizer, never pretrained);
* subsample: AutoModel-style partial load (`modeling_ssvit.py:235-249`,
  strict=False ≡ copy what matches: trunk layers + patch projection +
  position table + CLS).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from msvit_tpu.compat.hf_import import _np, import_vit_params


def _cls_token(state_dict: Mapping[str, Any]) -> np.ndarray:
    return _np(state_dict["embeddings.cls_token"])[0, 0]


def import_into_multistate(
    state_dict: Mapping[str, Any], config, params: Dict[str, Any]
) -> Dict[str, Any]:
    """params: MultiStateViTEncoderModel param tree (will be copied)."""
    trunk = import_vit_params(state_dict, config, add_cls_token=False)
    out = dict(params)
    out["embeddings"] = trunk["embeddings"]
    backbone = dict(out["backbone"])
    for i in range(config.num_hidden_layers):
        backbone[f"layer_{i}"] = trunk["encoder"][f"layer_{i}"]
    cls = jnp.asarray(_cls_token(state_dict))
    # distinct buffers: a donating train step (Trainer donate=True) may
    # not receive the same buffer twice in one donated tree
    backbone["transmitter_token"] = jnp.array(cls)
    backbone["receiver_token"] = jnp.array(cls)
    out["backbone"] = backbone
    return out


def transfer_base_to_multistate(
    base_params: Mapping[str, Any], params: Dict[str, Any], num_layers: int
) -> Dict[str, Any]:
    """Flax→flax version of the multistate bootstrap: initialize a
    MultiStateViTEncoderModel from a `ViTModel` param tree trained IN
    THIS FRAMEWORK (e.g. examples/train_digits.py) instead of an HF
    state dict — same semantics as the reference's pretrained load
    (`modeling_msvitencoder.py:681-690`): embeddings minus the CLS slot,
    per-layer trunk weights, TX/RX tokens from the CLS token.

    Oracle-tested against `import_into_multistate` on the same
    checkpoint (tests/test_family_transfer.py).  Position tables of a
    different length are bicubically resampled (the DINO trick)."""
    from msvit_tpu.models.base.vit import interpolate_pos_embed

    src_emb = base_params["embeddings"]
    out = dict(params)
    dst_emb = dict(out["embeddings"])
    dst_emb["patch_projection"] = src_emb["patch_projection"]
    pos = jnp.asarray(src_emb["position_embeddings"])[:, 1:]  # drop CLS row
    want_len = out["embeddings"]["position_embeddings"].shape[1]
    if pos.shape[1] != want_len:
        g = int(round(want_len**0.5))
        pos = interpolate_pos_embed(pos, want_len, (g, g), has_cls=False)
    dst_emb["position_embeddings"] = pos.astype(
        out["embeddings"]["position_embeddings"].dtype
    )
    out["embeddings"] = dst_emb

    backbone = dict(out["backbone"])
    for i in range(num_layers):
        backbone[f"layer_{i}"] = base_params["encoder"][f"layer_{i}"]
    cls = jnp.asarray(src_emb["cls_token"])[0, 0]
    # distinct buffers — see import_into_multistate (double donation)
    backbone["transmitter_token"] = jnp.array(cls)
    backbone["receiver_token"] = jnp.array(cls)
    out["backbone"] = backbone
    return out


def import_into_predictive(
    state_dict: Mapping[str, Any], config, params: Dict[str, Any]
) -> Dict[str, Any]:
    trunk = import_vit_params(state_dict, config, add_cls_token=True)
    out = dict(params)
    out["encoder"] = trunk["encoder"]
    out["cls_token"] = jnp.asarray(_cls_token(state_dict))
    return out


def import_into_subsample(
    state_dict: Mapping[str, Any], config, params: Dict[str, Any]
) -> Dict[str, Any]:
    """Copies trunk layers, patch projection, position table, CLS into a
    SubsampleViTModel (or ...ForImageClassification['model']) tree."""
    trunk = import_vit_params(state_dict, config, add_cls_token=True)
    out = dict(params)
    prefix = out["model"] if "model" in out else out
    prefix = dict(prefix)
    prefix["encoder"] = trunk["encoder"]
    emb = dict(prefix["embeddings"])
    emb["patch_projection"] = trunk["embeddings"]["patch_projection"]
    emb["position_embeddings"] = trunk["embeddings"]["position_embeddings"]
    prefix["embeddings"] = emb
    prefix["cls_token"] = jnp.asarray(_cls_token(state_dict))[None, None]
    if "model" in out:
        out["model"] = prefix
        return out
    return prefix
