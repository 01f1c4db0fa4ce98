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

def transfer_base_to_subsample(
    base_params, params, num_layers: int
):
    """Flax→flax subsample bootstrap (r4): initialize a SubsampleViT*
    model from a `ViTModel`/`ViTForImageClassification['vit']` tree
    trained IN THIS FRAMEWORK — the offline counterpart of the
    reference's AutoModel `post_init` load (`modeling_ssvit.py:235-249`),
    mirroring `transfer_base_to_multistate`.  Copies trunk layers, the
    patch projection (both sides are Dense [P²C, D] with the same
    (p1,p2,c) feature order), the CLS-rowed position table (bicubically
    resampled if lengths differ) and the CLS token.  Patch sizes must
    match (the projection kernel is patch-size-shaped)."""
    from msvit_tpu.models.base.vit import interpolate_pos_embed

    src_emb = base_params["embeddings"]
    out = dict(params)
    prefix = dict(out["model"]) if "model" in out else dict(out)
    # per-index layer copy (ADVICE r4): wholesale encoder copy would
    # silently install extra unused layers from a deeper base trunk, or
    # leave randomly-initialized layers from a shallower one
    missing = [
        i for i in range(num_layers)
        if f"layer_{i}" not in base_params["encoder"]
    ]
    if missing:
        raise ValueError(
            f"base trunk has no layer(s) {missing}; need {num_layers} "
            "layers for the subsample model"
        )
    prefix["encoder"] = {
        **prefix["encoder"],
        **{
            f"layer_{i}": base_params["encoder"][f"layer_{i}"]
            for i in range(num_layers)
        },
    }
    emb = dict(prefix["embeddings"])
    src_proj = src_emb["patch_projection"]
    dst_proj = emb["patch_projection"]
    if jnp.asarray(src_proj["kernel"]).shape != jnp.asarray(
        dst_proj["kernel"]
    ).shape:
        raise ValueError(
            "patch_projection shapes differ "
            f"({jnp.asarray(src_proj['kernel']).shape} vs "
            f"{jnp.asarray(dst_proj['kernel']).shape}) — the subsample "
            "config must use the base trunk's patch_size"
        )
    emb["patch_projection"] = src_proj
    pos = jnp.asarray(src_emb["position_embeddings"])
    want_len = emb["position_embeddings"].shape[1]
    if pos.shape[1] != want_len:
        g = int(round((want_len - 1) ** 0.5))
        pos = interpolate_pos_embed(pos, want_len - 1, (g, g), has_cls=True)
    emb["position_embeddings"] = pos.astype(
        jnp.asarray(emb["position_embeddings"]).dtype
    )
    prefix["embeddings"] = emb
    prefix["cls_token"] = jnp.array(jnp.asarray(src_emb["cls_token"]))
    if "model" in out:
        out["model"] = prefix
        return out
    return prefix
