"""int8-quantized ViT inference path.

Serving-oriented: all seven matmuls per block (patchify, fused QKV, output
projection, fc1, fc2) run as int8×int8→int32 on the MXU (~1.5× the bf16
rate on v5e — see benchmarks); LayerNorm statistics, softmax, residuals
stay in f32/bf16.  Weights are quantized once per-output-channel from the
trained f32 params (`quantize_vit_params`); activations dynamically
per-tensor.

This is an inference-only companion to `models/base/vit.ViTModel` — new
capability vs the reference (which has no quantization story), motivated
by the BASELINE.json throughput bar: bf16 peak on this chip caps ViT-B
below the target.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from msvit_tpu.models.base.config import BaseViTConfig
from msvit_tpu.models.base.vit import interpolate_pos_embed
from msvit_tpu.ops.attention import multi_head_attention
from msvit_tpu.ops.packed_attention import (
    packed_attention,
    packed_attention_int8,
)
from msvit_tpu.ops.quant import (
    QuantizedTensor,
    int8_matmul,
    int8_matmul_prequant,
    quantize_weight,
)


def _fold_ls(w: QuantizedTensor, bias, ls) -> Dict[str, Any]:
    # DINOv2 layer scale is a per-channel multiply on the residual
    # branch output — exactly the shape of the dequant scale, so it
    # folds into the epilogue for free:
    #   (acc*s + b) * ls == acc*(s*ls) + b*ls
    ls = jnp.asarray(ls, jnp.float32)
    return {
        "w": QuantizedTensor(w.values, w.scale * ls[None, :]),
        "bias": bias.astype(jnp.float32) * ls,
    }


def quantize_layer_params(layer: Dict[str, Any]) -> Dict[str, Any]:
    """One BaseViTLayer param subtree → quantized inference dict (qkv /
    proj / fc1 / fc2 int8 per-channel, layer scales folded into the
    proj/fc2 dequant scales, norms passthrough).  Shared by the ViT and
    multistate quantizers."""
    attn = layer["attention"]
    if "q_norm" in attn or "k_norm" in attn:
        # ADVICE r4 (medium): the hand-rolled int8 apply loops read a
        # fixed norm1→qkv→attention layout and would silently SKIP the
        # per-head q/k LayerNorms of a qk_norm-trained trunk, serving
        # numerically different attention.  Refuse loudly until the
        # quantized trunk loop implements the normalization.
        raise ValueError(
            "quantize_layer_params: source params carry q_norm/k_norm "
            "(config.qk_norm trunk); the int8 apply paths do not "
            "implement qk-norm — serve this trunk through the bf16 path"
        )
    d = attn["qkv_kernel"].shape[0]
    return {
        "qkv": {
            "w": quantize_weight(
                jnp.asarray(attn["qkv_kernel"]).reshape(d, -1)
            ),
            "bias": jnp.asarray(attn["qkv_bias"]).reshape(-1)
            if "qkv_bias" in attn
            else None,
        },
        "proj": _fold_ls(
            quantize_weight(jnp.asarray(attn["output_dense"]["kernel"])),
            jnp.asarray(attn["output_dense"]["bias"]),
            layer["layer_scale1"],
        ),
        "fc1": {
            "w": quantize_weight(jnp.asarray(layer["mlp"]["fc1"]["kernel"])),
            "bias": jnp.asarray(layer["mlp"]["fc1"]["bias"]),
        },
        "fc2": _fold_ls(
            quantize_weight(jnp.asarray(layer["mlp"]["fc2"]["kernel"])),
            jnp.asarray(layer["mlp"]["fc2"]["bias"]),
            layer["layer_scale2"],
        ),
        "norm1": layer["norm1"],
        "norm2": layer["norm2"],
    }


def quantize_vit_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """ViTModel param pytree → quantized inference pytree (kernels int8 +
    per-channel scales; everything else f32 passthrough)."""
    q: Dict[str, Any] = {"embeddings": dict(params["embeddings"]), "encoder": {}}
    emb = q["embeddings"]
    emb["patch_projection"] = {
        "w": quantize_weight(jnp.asarray(params["embeddings"]["patch_projection"]["kernel"])),
        "bias": jnp.asarray(params["embeddings"]["patch_projection"]["bias"]),
    }
    for name, layer in params["encoder"].items():
        q["encoder"][name] = quantize_layer_params(layer)
    q["layernorm"] = params["layernorm"]
    return q


def _layer_norm(x, p, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(jnp.bfloat16)


def quantized_vit_apply(
    qparams: Dict[str, Any],
    config: BaseViTConfig,
    pixel_values: jnp.ndarray,  # [B, H, W, C] NHWC
    interpolate_pos_encoding: bool = False,
    act_scales: Dict[str, Any] = None,
    _record_scales: Dict[str, Any] = None,
    use_kernels: bool = None,
) -> jnp.ndarray:
    """int8 inference forward; returns last_hidden_state [B, N+1, D].

    `act_scales` (from `calibrate_act_scales`) switches activation
    quantization from dynamic absmax to static calibrated scales — one
    fewer full read of every matmul input.  `use_kernels` forces the
    Pallas attention paths on (interpret mode off-TPU — for tests) or
    off; default: on exactly on TPU."""
    cfg = config
    p = cfg.patch_size
    b, img_h, img_w, c = pixel_values.shape
    gh, gw = img_h // p, img_w // p
    d, h, dh = cfg.hidden_size, cfg.num_attention_heads, cfg.head_dim
    eps = cfg.layer_norm_eps

    def mm(site, x, wp):
        if _record_scales is not None:
            _record_scales[site] = (
                jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
            )
        s = act_scales.get(site) if act_scales else None
        return int8_matmul(x, wp["w"], wp["bias"], act_scale=s)

    x = pixel_values.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
    emb = qparams["embeddings"]
    x = mm("patch", x, emb["patch_projection"])

    pos = jnp.asarray(emb["position_embeddings"])
    cls = jnp.broadcast_to(jnp.asarray(emb["cls_token"]), (b, 1, d))
    x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
    if interpolate_pos_encoding or gh * gw != cfg.num_patches:
        pos = interpolate_pos_embed(pos, gh * gw, (gh, gw), has_cls=True)
    x = x + pos.astype(x.dtype)

    on_tpu = (
        use_kernels
        if use_kernels is not None
        else jax.devices()[0].platform == "tpu"
    )
    # fully-int8 attention data path needs calibrated per-section scales
    int8_attn = (
        on_tpu
        and act_scales is not None
        and "attn_0" in act_scales
        and _record_scales is None
    )
    n = x.shape[1]
    for i in range(cfg.num_hidden_layers):
        lp = qparams["encoder"][f"layer_{i}"]
        y = _layer_norm(x, lp["norm1"], eps)
        if int8_attn:
            # qkv GEMM emits int8 (per-section requant in the epilogue),
            # the Pallas kernel runs both attention matmuls in int8 and
            # emits int8 at the proj GEMM's calibrated input scale: every
            # HBM tensor on the attention path is half-width.
            sec = act_scales[f"attn_{i}"]  # [3]
            s_proj = act_scales[f"proj_{i}"]
            inv_cols = jnp.repeat(1.0 / sec, d)  # [3D]
            s_in = act_scales.get(f"qkv_{i}")
            qkv_q = int8_matmul(
                y, lp["qkv"]["w"], lp["qkv"]["bias"],
                act_scale=s_in, out_inv_scale=inv_cols,
            )
            out_q = packed_attention_int8(
                qkv_q, sec, h, out_inv_scale=1.0 / s_proj, int8_out=True
            )
            out = int8_matmul_prequant(
                out_q, s_proj, lp["proj"]["w"], lp["proj"]["bias"]
            )
        else:
            qkv = mm(f"qkv_{i}", y, lp["qkv"])  # [B,N,3HD]
            if _record_scales is not None:
                ys = jnp.max(
                    jnp.abs(qkv.astype(jnp.float32).reshape(-1, 3, d)),
                    axis=(0,),
                )
                _record_scales[f"attn_{i}"] = jnp.max(ys, axis=-1) / 127.0
            if on_tpu:
                # packed-layout Pallas attention: consumes the GEMM output
                # directly, no [3,B,H,N,dh] HBM transposes, scores stay in
                # VMEM (3.7 vs 8.3 ms/layer at bs512 — benchmarks/RESULTS.md)
                out = packed_attention(qkv, h)
            else:
                t = qkv.reshape(b, n, 3, h, dh).transpose(2, 0, 3, 1, 4)
                out, _ = multi_head_attention(
                    t[0], t[1], t[2], implementation="xla"
                )
                out = jnp.swapaxes(out, 1, 2).reshape(b, n, d)
            out = mm(f"proj_{i}", out, lp["proj"])  # layer_scale1 folded
        x = x + out

        y = _layer_norm(x, lp["norm2"], eps)
        y = mm(f"fc1_{i}", y, lp["fc1"])
        # tanh-form erf GELU (ops/gelu.py): XLA's erf polynomial costs
        # 4.5 ms per fc1 pass on v5e (~54 ms/batch over 12 layers —
        # benchmarks/RESULTS.md) while the fitted tanh form runs at
        # hardware-tanh speed with erf abs err ≤4.3e-5 — erf-grade
        # accuracy, no longer the ~1e-3-off torch 'tanh' approximation.
        from msvit_tpu.ops.gelu import gelu_erf_tanh

        y = gelu_erf_tanh(y)
        y = mm(f"fc2_{i}", y, lp["fc2"])  # layer_scale2 folded in
        x = x + y

    return _layer_norm(x, qparams["layernorm"], eps)


def calibrate_act_scales(
    qparams: Dict[str, Any],
    config: BaseViTConfig,
    sample_pixels: jnp.ndarray,
    margin: float = 1.1,
    use_kernels: bool = None,
) -> Dict[str, jnp.ndarray]:
    """One dynamic-quant forward over a representative batch, recording the
    per-site activation absmax scales (× a safety margin)."""
    record: Dict[str, Any] = {}
    quantized_vit_apply(
        qparams, config, sample_pixels, _record_scales=record,
        use_kernels=use_kernels,
    )
    return {k: jax.lax.stop_gradient(v) * margin for k, v in record.items()}
