"""Import HF ViT / DINOv2 PyTorch checkpoints into msvit_tpu param pytrees.

The reference bootstraps its encoders from `facebook/dino-vitb8` /
`facebook/dinov2-base-imagenet1k-1-layer` via `from_pretrained` + partial
`load_state_dict` (reference `modeling_msvitencoder.py:681-690`,
`modeling_spvitencoder.py:498-509`, `modeling_ssvit.py:235-249`).  Here the
equivalent is an explicit name-mapped tensor conversion:

* torch ``Linear.weight`` is [out, in] → flax kernel [in, out] (transpose);
* q/k/v projections fuse into one ``qkv_kernel`` [D, 3, H, Dh];
* the stride-P patch conv [D, C, P, P] becomes a matmul kernel
  [P·P·C, D] with feature order (p1, p2, c) — matching
  `msvit_tpu.models.base.vit.ViTEmbeddings`.

Nothing is downloaded implicitly: callers pass a state_dict (from
`torch.load`, safetensors, or a live `transformers` model) — the TPU
analog of the reference's `pretrained` config pointer.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from msvit_tpu.models.base.config import BaseViTConfig


def _np(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().numpy()


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .bin/.pt/.safetensors checkpoint into numpy arrays."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in sd.items()}


# Prefix aliases: HF ViTModel vs Dinov2Model parameter names.
_LAYER_ALIASES = {
    "norm1": ("layernorm_before", "norm1"),
    "norm2": ("layernorm_after", "norm2"),
    "fc1": ("intermediate.dense", "mlp.fc1"),
    "fc2": ("output.dense", "mlp.fc2"),
}


def _get(sd: Mapping[str, Any], *names: str) -> np.ndarray:
    for n in names:
        if n in sd:
            return _np(sd[n])
    raise KeyError(f"none of {names} found in state_dict")


def _has(sd: Mapping[str, Any], *names: str) -> bool:
    return any(n in sd for n in names)


def import_vit_params(
    state_dict: Mapping[str, Any],
    config: BaseViTConfig,
    add_cls_token: bool = True,
    add_pooler: bool = False,
    prefix: str = "",
) -> Dict[str, Any]:
    """Convert an HF ViTModel/Dinov2Model state_dict to msvit ViTModel params.

    Returns a flax params dict for `msvit_tpu.models.base.vit.ViTModel`.
    Tolerates missing pooler / cls entries (partial load, mirroring the
    reference's `strict=False`, `modeling_ssvit.py:243-249`).
    """
    d, h = config.hidden_size, config.num_attention_heads
    dh = config.head_dim
    g = lambda *names: _get(state_dict, *(prefix + n for n in names))  # noqa: E731
    has = lambda *names: _has(state_dict, *(prefix + n for n in names))  # noqa: E731

    # --- embeddings ---
    conv_w = g("embeddings.patch_embeddings.projection.weight")
    conv_b = g("embeddings.patch_embeddings.projection.bias")
    patch_kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, d)

    emb: Dict[str, Any] = {
        "patch_projection": {"kernel": patch_kernel, "bias": conv_b},
        "position_embeddings": g("embeddings.position_embeddings"),
    }
    if add_cls_token and has("embeddings.cls_token"):
        emb["cls_token"] = g("embeddings.cls_token")
    if not add_cls_token:
        # dropping CLS (multistate embeddings, reference
        # `modeling_msvitencoder.py:107-117`): drop its position row too.
        emb["position_embeddings"] = emb["position_embeddings"][:, 1:]

    # --- encoder layers ---
    encoder: Dict[str, Any] = {}
    for i in range(config.num_hidden_layers):
        lp = f"encoder.layer.{i}."
        qw = g(lp + "attention.attention.query.weight")
        kw = g(lp + "attention.attention.key.weight")
        vw = g(lp + "attention.attention.value.weight")
        # [out,in] -> [in,out] -> [D,H,Dh]; stack q/k/v on axis 1
        qkv_kernel = np.stack(
            [w.T.reshape(d, h, dh) for w in (qw, kw, vw)], axis=1
        )
        layer: Dict[str, Any] = {
            "attention": {
                "qkv_kernel": qkv_kernel,
                "output_dense": {
                    "kernel": g(lp + "attention.output.dense.weight").T,
                    "bias": g(lp + "attention.output.dense.bias"),
                },
            },
            "mlp": (
                {
                    # DINOv2 SwiGLU naming matches ours directly
                    "weights_in": {
                        "kernel": g(lp + "mlp.weights_in.weight").T,
                        "bias": g(lp + "mlp.weights_in.bias"),
                    },
                    "weights_out": {
                        "kernel": g(lp + "mlp.weights_out.weight").T,
                        "bias": g(lp + "mlp.weights_out.bias"),
                    },
                }
                if config.use_swiglu_ffn
                else {
                    "fc1": {
                        "kernel": g(
                            *(lp + a + ".weight" for a in _LAYER_ALIASES["fc1"])
                        ).T,
                        "bias": g(
                            *(lp + a + ".bias" for a in _LAYER_ALIASES["fc1"])
                        ),
                    },
                    "fc2": {
                        "kernel": g(
                            *(lp + a + ".weight" for a in _LAYER_ALIASES["fc2"])
                        ).T,
                        "bias": g(
                            *(lp + a + ".bias" for a in _LAYER_ALIASES["fc2"])
                        ),
                    },
                }
            ),
            "norm1": {
                "scale": g(*(lp + a + ".weight" for a in _LAYER_ALIASES["norm1"])),
                "bias": g(*(lp + a + ".bias" for a in _LAYER_ALIASES["norm1"])),
            },
            "norm2": {
                "scale": g(*(lp + a + ".weight" for a in _LAYER_ALIASES["norm2"])),
                "bias": g(*(lp + a + ".bias" for a in _LAYER_ALIASES["norm2"])),
            },
        }
        if config.qkv_bias:
            layer["attention"]["qkv_bias"] = np.stack(
                [
                    g(lp + f"attention.attention.{n}.bias").reshape(h, dh)
                    for n in ("query", "key", "value")
                ],
                axis=0,
            )
        # layer scale: DINOv2 has lambda1; plain ViT doesn't → identity (1.0)
        if has(lp + "layer_scale1.lambda1"):
            layer["layer_scale1"] = g(lp + "layer_scale1.lambda1")
            layer["layer_scale2"] = g(lp + "layer_scale2.lambda1")
        else:
            layer["layer_scale1"] = np.full((d,), config.layerscale_value, np.float32)
            layer["layer_scale2"] = np.full((d,), config.layerscale_value, np.float32)
        encoder[f"layer_{i}"] = layer

    params: Dict[str, Any] = {
        "embeddings": emb,
        "encoder": encoder,
        "layernorm": {"scale": g("layernorm.weight"), "bias": g("layernorm.bias")},
    }
    if add_pooler and has("pooler.dense.weight"):
        params["pooler_dense"] = {
            "kernel": g("pooler.dense.weight").T,
            "bias": g("pooler.dense.bias"),
        }
    return params
