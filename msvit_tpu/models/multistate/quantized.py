"""int8-quantized multistate encoder inference path.

Serving companion to `MultiStateViTEncoderModel` (same loop as
`models/multistate/model.py::MultiStateViTEncoderBackbone`, reference
`modeling_msvitencoder.py:412-552`): every trunk GEMM runs int8×int8→int32
on the MXU and the soft-masked attention runs in the head-grouped int8
Pallas kernel (`ops/packed_attention.py::packed_attention_int8_masked`)
with both attention matmuls in int8 and half-width HBM tensors.

Clustering (spectral NCut + KMeans), mask construction, and TX/RX
duplication stay in f32/int32 exactly as the bf16 model — they are
control flow, not trunk FLOPs (~30% of the forward with shared anchors,
benchmarks/RESULTS.md "Multistate cost composition").  The last layer
runs the bf16 path because the pooler needs its attention probabilities
(the RX→TX block, reference `:555-561`) which the fused int8 kernel never
materializes.

New capability vs the reference (no quantization story upstream); the r3
deferral ("bs8 M too small to amortize dynamic quant") is resolved by
calibrated static activation scales — no runtime absmax pass.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from msvit_tpu.models.base.quantized import (
    _layer_norm,
    quantize_layer_params,
)
from msvit_tpu.models.base.vit import interpolate_pos_embed
from msvit_tpu.models.clustering import cluster, max_children_bound
from msvit_tpu.models.multistate.config import MultiStateViTConfig
from msvit_tpu.models.multistate.model import build_multistate_attention_mask
from msvit_tpu.ops.attention import multi_head_attention, xla_attention
from msvit_tpu.ops.packed_attention import (
    int8_grouped_vmem_ok,
    packed_attention,
    packed_attention_int8_masked,
)
from msvit_tpu.ops.quant import int8_matmul, int8_matmul_prequant, quantize_weight


def quantize_multistate_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """MultiStateViTEncoderModel param pytree → quantized inference pytree.
    Accepts either the encoder model's tree ({embeddings, backbone}) or a
    classifier's ({encoder: {...}, classifier} — the head stays f32 and is
    not carried)."""
    if "encoder" in params and "embeddings" not in params:
        params = params["encoder"]
    emb = params["embeddings"]
    bb = params["backbone"]
    q: Dict[str, Any] = {
        "embeddings": {
            "patch_projection": {
                "w": quantize_weight(
                    jnp.asarray(emb["patch_projection"]["kernel"])
                ),
                "bias": jnp.asarray(emb["patch_projection"]["bias"]),
            },
            "position_embeddings": emb["position_embeddings"],
        },
        "backbone": {
            "transmitter_token": jnp.asarray(bb["transmitter_token"]),
            "receiver_token": jnp.asarray(bb["receiver_token"]),
            "layers": {
                name: quantize_layer_params(layer)
                for name, layer in bb.items()
                if name.startswith("layer_")
            },
        },
    }
    return q


def quantized_multistate_apply(
    qparams: Dict[str, Any],
    config: MultiStateViTConfig,
    pixel_values: jnp.ndarray,  # [B, H, W, C] NHWC
    rng: jax.Array,
    act_scales: Optional[Dict[str, Any]] = None,
    _record_scales: Optional[Dict[str, Any]] = None,
    use_kernels: Optional[bool] = None,
    interpolate_pos_encoding: bool = False,
    attn_mode: str = "bf16",
) -> Dict[str, Any]:
    """int8 multistate inference forward.

    Returns the pooler-level outputs of `MultiStateViTEncoderModel`:
    last_hidden_state, cluster_tokens (TX), last_cluster_indices,
    num_clusters, receiver_to_transmitter_attentions.

    `attn_mode` picks the trunk attention: "bf16" (default — int8 GEMMs
    around the bf16 shaved packed kernel), "banded" (int8 GEMMs around
    the cluster-banded bf16 kernel, `ops/banded_attention.py` — tokens
    kept cluster-sorted, dead key blocks skipped, no [S,S] mask
    materialized; ~1.1-1.2x the packed kernel at the BASELINE shape) or
    "int8" (the fully-int8 masked kernel; needs `act_scales` from
    `calibrate_multistate_act_scales`).  Default is bf16 because at the
    multistate shape (N=816, soft-masked) the int8 kernel's extra
    [N,N] VPU work loses to its MXU savings — measured 9.5 vs 6.4
    ms/layer-equiv at bs32 (proto_msint8_parts.py; RESULTS.md records
    the negative).  While `_record_scales` is collecting, attention
    always runs dense bf16 (absmax scales are permutation-invariant, so
    they serve every mode)."""
    cfg = config
    p = cfg.patch_size
    b, img_h, img_w, _ = pixel_values.shape
    gh, gw = img_h // p, img_w // p
    d, h = cfg.hidden_size, cfg.num_attention_heads
    c = cfg.max_clusters
    eps = cfg.layer_norm_eps

    def mm(site, x, wp):
        if _record_scales is not None:
            _record_scales[site] = (
                jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
            )
        s = act_scales.get(site) if act_scales else None
        return int8_matmul(x, wp["w"], wp["bias"], act_scale=s)

    # embeddings (ViT minus CLS, reference `:107-117`)
    x = pixel_values.reshape(b, gh, p, gw, p, pixel_values.shape[-1])
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, -1)
    emb = qparams["embeddings"]
    x = mm("patch", x, emb["patch_projection"])
    pos = jnp.asarray(emb["position_embeddings"])
    if interpolate_pos_encoding or gh * gw != cfg.num_patches:
        pos = interpolate_pos_embed(pos, gh * gw, (gh, gw), has_cls=False)
    hidden = x + pos.astype(x.dtype)
    n = hidden.shape[1]

    on_tpu = (
        use_kernels
        if use_kernels is not None
        else jax.devices()[0].platform == "tpu"
    )
    if attn_mode not in ("bf16", "int8", "banded"):
        raise ValueError(
            f"attn_mode must be 'bf16', 'int8' or 'banded'; got {attn_mode}"
        )
    int8_attn = (
        attn_mode == "int8"
        and on_tpu
        and act_scales is not None
        and "attn_0" in act_scales
        and _record_scales is None
        and int8_grouped_vmem_ok(2 * c + n, d, h)
    )
    banded = attn_mode == "banded" and _record_scales is None
    # banded mode: tokens kept sorted by cluster id (see
    # models/multistate/model.py — clustering must see the ORIGINAL
    # order so its positional anchor draws match the dense modes)
    order = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    inv_order = order

    def unsort(arr, inv):
        if not banded:
            return arr
        idx = inv.reshape(inv.shape + (1,) * (arr.ndim - 2))
        return jnp.take_along_axis(arr, idx, axis=1)

    bb = qparams["backbone"]
    tx = bb["transmitter_token"]
    rx = bb["receiver_token"]
    cluster_tokens = jnp.broadcast_to(
        jnp.stack([tx, rx])[None, None], (b, c, 2, d)
    ).astype(hidden.dtype)
    cluster_indices = jnp.zeros((b, n), jnp.int32)
    n_clusters = jnp.asarray(1, jnp.int32)
    mask = (
        None
        if banded
        else build_multistate_attention_mask(cluster_indices, n_clusters, c)
    )

    rx_to_tx = None
    # static per-call parent bound (see models/multistate/model.py)
    parents_bound = 1
    for i in range(cfg.num_hidden_layers):
        if i >= cfg.pregeneration_period and i % cfg.generation_period == 0:
            rng, step_key = jax.random.split(rng)
            h_orig = unsort(hidden, inv_order)
            child_indices, n_children = cluster(
                cfg.clustering,
                unsort(cluster_indices, inv_order),
                jax.lax.stop_gradient(h_orig.astype(jnp.float32)),
                step_key,
                max_parents=parents_bound,
            )
            parents_bound = max_children_bound(cfg.clustering, parents_bound)
            # TX/RX duplication via cumsum + searchsorted
            # (models/multistate/model.py, reference `:494-502`)
            cum = jnp.cumsum(n_children, axis=-1)
            if n_children.ndim == 1:
                parent_of = jnp.searchsorted(
                    cum, jnp.arange(c), side="right"
                ).astype(jnp.int32)
                parent_of = jnp.clip(parent_of, 0, c - 1)
                cluster_tokens = cluster_tokens[:, parent_of]
                n_clusters = jnp.maximum(cum[-1].astype(jnp.int32), 1)
            else:
                parent_of = jax.vmap(
                    lambda cm: jnp.searchsorted(cm, jnp.arange(c), side="right")
                )(cum).astype(jnp.int32)
                parent_of = jnp.clip(parent_of, 0, c - 1)
                cluster_tokens = jnp.take_along_axis(
                    cluster_tokens, parent_of[:, :, None, None], axis=1
                )
                n_clusters = jnp.maximum(cum[:, -1].astype(jnp.int32), 1)
            if banded:
                order = jnp.argsort(child_indices, axis=1)
                inv_order = jnp.argsort(order, axis=1)
                hidden = jnp.take_along_axis(
                    h_orig, order[..., None], axis=1
                )
                cluster_indices = jnp.take_along_axis(
                    child_indices, order, axis=1
                )
            else:
                cluster_indices = child_indices
                mask = build_multistate_attention_mask(
                    cluster_indices, n_clusters, c
                )

        concat = jnp.concatenate(
            [cluster_tokens.reshape(b, 2 * c, d), hidden], axis=1
        )
        need_probs = i == cfg.num_hidden_layers - 1
        if banded and need_probs:  # last layer: dense over sorted tokens
            mask = build_multistate_attention_mask(
                cluster_indices, n_clusters, c
            )
        additive = (
            None
            if mask is None
            else jnp.where(mask, 0.0, -cfg.attention_mask_inf).astype(
                jnp.float32
            )
        )
        lp = bb["layers"][f"layer_{i}"]

        y = _layer_norm(concat, lp["norm1"], eps)
        if int8_attn and not need_probs:
            sec = act_scales[f"attn_{i}"]  # [3]
            s_proj = act_scales[f"proj_{i}"]
            inv_cols = jnp.repeat(1.0 / sec, d)  # [3D]
            qkv_q = int8_matmul(
                y, lp["qkv"]["w"], lp["qkv"]["bias"],
                act_scale=act_scales.get(f"qkv_{i}"), out_inv_scale=inv_cols,
            )
            out_q = packed_attention_int8_masked(
                qkv_q, sec, h, mask=additive,
                out_inv_scale=1.0 / s_proj, int8_out=True,
            )
            out = int8_matmul_prequant(
                out_q, s_proj, lp["proj"]["w"], lp["proj"]["bias"]
            )
        else:
            qkv = mm(f"qkv_{i}", y, lp["qkv"])  # [B, 2C+N, 3D]
            if _record_scales is not None:
                ys = jnp.max(
                    jnp.abs(qkv.astype(jnp.float32).reshape(-1, 3, d)),
                    axis=(0,),
                )
                _record_scales[f"attn_{i}"] = jnp.max(ys, axis=-1) / 127.0
            if need_probs:
                nt = qkv.shape[1]
                dh = d // h
                t = qkv.reshape(b, nt, 3, h, dh).transpose(2, 0, 3, 1, 4)
                out4, probs = xla_attention(t[0], t[1], t[2], mask=additive)
                rx_to_tx = probs[:, :, 1 : 2 * c : 2, 0 : 2 * c : 2]
                out = jnp.swapaxes(out4, 1, 2).reshape(b, nt, d).astype(
                    qkv.dtype
                )
            elif banded:
                from msvit_tpu.ops.banded_attention import (
                    BandedSegments,
                    multistate_banded_attention,
                )

                dh = d // h
                qkv_s = jnp.concatenate(
                    [
                        qkv[:, :, :d] * jnp.asarray(dh**-0.5, qkv.dtype),
                        qkv[:, :, d:],
                    ],
                    axis=-1,
                )
                out = multistate_banded_attention(
                    qkv_s,
                    BandedSegments(
                        cid=cluster_indices,
                        n_clusters=n_clusters,
                        max_clusters=c,
                        mask_inf=cfg.attention_mask_inf,
                    ),
                    h,
                )
            elif on_tpu:
                # r4: the per-head fused kernel beats the packed-layout
                # one 2.2x at the masked multistate shape (7.6 vs 16.9 ms
                # per 12 layers at bs8; bench_attn816_race_r4.py) — the
                # unpack transposes are included in that win.  flash
                # covers shapes whose score tile exceeds fused's VMEM
                # gate (the multi_head_attention auto rule).
                nt = qkv.shape[1]
                dh = d // h
                t = qkv.reshape(b, nt, 3, h, dh).transpose(2, 0, 3, 1, 4)
                # inference=True: the shaved-softmax + transposed-PV
                # fused kernel (r5) — this apply fn is serving-only by
                # construction (int8 GEMMs have no grad path)
                out4, _ = multi_head_attention(
                    t[0], t[1], t[2], mask=additive, implementation="auto",
                    inference=True,
                )
                out = jnp.swapaxes(out4, 1, 2).reshape(b, nt, d).astype(
                    qkv.dtype
                )
            else:
                nt = qkv.shape[1]
                dh = d // h
                t = qkv.reshape(b, nt, 3, h, dh).transpose(2, 0, 3, 1, 4)
                out4, _ = xla_attention(t[0], t[1], t[2], mask=additive)
                out = jnp.swapaxes(out4, 1, 2).reshape(b, nt, d).astype(
                    qkv.dtype
                )
            out = mm(f"proj_{i}", out, lp["proj"])  # layer_scale1 folded
        concat = concat + out

        y = _layer_norm(concat, lp["norm2"], eps)
        y = mm(f"fc1_{i}", y, lp["fc1"])
        from msvit_tpu.ops.gelu import gelu_erf_tanh

        y = gelu_erf_tanh(y)
        y = mm(f"fc2_{i}", y, lp["fc2"])  # layer_scale2 folded
        concat = concat + y

        cluster_tokens = concat[:, : 2 * c].reshape(b, c, 2, d)
        hidden = concat[:, 2 * c :]

    return {
        "last_hidden_state": unsort(hidden, inv_order),
        "last_cluster_tokens": cluster_tokens,
        "cluster_tokens": cluster_tokens[:, :, 0, :],
        "last_cluster_indices": unsort(cluster_indices, inv_order),
        "num_clusters": n_clusters,
        "receiver_to_transmitter_attentions": rx_to_tx,
    }


def calibrate_multistate_act_scales(
    qparams: Dict[str, Any],
    config: MultiStateViTConfig,
    sample_pixels: jnp.ndarray,
    rng: jax.Array,
    margin: float = 1.1,
    use_kernels: Optional[bool] = None,
) -> Dict[str, jnp.ndarray]:
    """One dynamic-quant forward over a representative batch, recording
    per-site activation absmax scales (× a safety margin).  Clustering is
    stochastic: calibrate with a representative rng (scales are maxima —
    modest partition changes move them little; the margin absorbs it)."""
    record: Dict[str, Any] = {}
    quantized_multistate_apply(
        qparams, config, sample_pixels, rng, _record_scales=record,
        use_kernels=use_kernels,
    )
    return {k: jax.lax.stop_gradient(v) * margin for k, v in record.items()}
