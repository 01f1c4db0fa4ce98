"""Standard ViT assembled from the base trunk: patch embeddings + encoder +
final LayerNorm (+ optional tanh pooler).

The reference's base encoder has no embedding front end of its own (each
family supplies one — SURVEY §2.2 note); this module provides the standard
HF-ViT-compatible front end used for (a) numerical parity tests against
`transformers.ViTModel`, (b) the flagship inference benchmark
(BASELINE.json: ViT-B/16 @224), and (c) the multistate encoder embeddings
(which drop the CLS token, reference `modeling_msvitencoder.py:107-117`).

TPU-first: patchify is a reshape + one MXU matmul (equivalent to the
stride-P conv, reference uses `Conv2d` via HF `ViTPatchEmbeddings`);
pixel layout is NHWC (TPU-native), not NCHW.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from msvit_tpu.models.base.config import BaseViTConfig
from msvit_tpu.models.base.model import BaseViTEncoder, trunc_normal_init


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, num_patches: int, grid_hw: tuple, has_cls: bool = True
) -> jnp.ndarray:
    """Bicubic-resample a [1, N(+1), D] position table to a new patch grid —
    the DINO trick (HF `ViTEmbeddings.interpolate_pos_encoding`; reference
    relies on it via `interpolate_pos_encoding=True`, `sandbox/test.py:79`).
    """
    n_table = pos_embed.shape[1] - (1 if has_cls else 0)
    if n_table == num_patches:
        return pos_embed
    cls_pos = pos_embed[:, :1] if has_cls else None
    grid_pos = pos_embed[:, 1:] if has_cls else pos_embed
    d = grid_pos.shape[-1]
    old = int(round(n_table**0.5))
    gh, gw = grid_hw
    grid_pos = grid_pos.reshape(1, old, old, d)
    grid_pos = jax.image.resize(grid_pos, (1, gh, gw, d), method="bicubic")
    grid_pos = grid_pos.reshape(1, gh * gw, d)
    if has_cls:
        return jnp.concatenate([cls_pos, grid_pos], axis=1)
    return grid_pos


class ViTEmbeddings(nn.Module):
    """Patchify + (optional) CLS + learned position embeddings."""

    config: BaseViTConfig
    add_cls_token: bool = True

    @nn.compact
    def __call__(
        self,
        pixel_values: jnp.ndarray,  # [B, H, W, C] (NHWC)
        deterministic: bool = True,
        interpolate_pos_encoding: bool = False,
    ) -> jnp.ndarray:
        cfg = self.config
        p = cfg.patch_size
        b, img_h, img_w, c = pixel_values.shape
        if c != cfg.num_channels and img_h == cfg.num_channels:
            raise ValueError(
                f"pixel_values look channels-first {pixel_values.shape}; "
                "this framework is NHWC — transpose(0, 2, 3, 1) torch-style "
                "inputs"
            )
        gh, gw = img_h // p, img_w // p

        # reshape-patchify: [B,H,W,C] -> [B, gh*gw, P*P*C]; feature order
        # (p1, p2, c) matches a torch Conv2d weight [D, C, P, P] transposed
        # to (P, P, C, D) — see msvit_tpu.compat.hf_import.
        x = pixel_values.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
        x = nn.Dense(
            cfg.hidden_size,
            kernel_init=trunc_normal_init(cfg.initializer_range),
            dtype=cfg.policy.compute,
            param_dtype=cfg.policy.param,
            name="patch_projection",
        )(x.astype(cfg.policy.compute))

        pos_table_len = cfg.num_patches + (1 if self.add_cls_token else 0)
        pos_embed = self.param(
            "position_embeddings",
            trunc_normal_init(cfg.initializer_range),
            (1, pos_table_len, cfg.hidden_size),
        )
        if self.add_cls_token:
            cls = self.param(
                "cls_token",
                trunc_normal_init(cfg.initializer_range),
                (1, 1, cfg.hidden_size),
            )
            x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)).astype(x.dtype), x], axis=1)

        if interpolate_pos_encoding or gh * gw != cfg.num_patches:
            pos_embed = interpolate_pos_embed(
                pos_embed, gh * gw, (gh, gw), has_cls=self.add_cls_token
            )
        x = x + pos_embed.astype(x.dtype)
        if cfg.hidden_dropout_prob > 0.0:
            x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        return x


class ViTModel(nn.Module):
    """Embeddings → trunk → final LayerNorm (+ optional pooler).

    Numerically equivalent to HF `ViTModel` when layerscale_value=1 and
    drop_path=0 (verified by tests/test_base_parity.py on CPU, the
    BASELINE.json parity bar)."""

    config: BaseViTConfig
    add_cls_token: bool = True
    add_pooler: bool = False

    @nn.compact
    def __call__(
        self,
        pixel_values: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        interpolate_pos_encoding: bool = False,
        output_attentions: bool = False,
        output_hidden_states: bool = False,
    ):
        cfg = self.config
        x = ViTEmbeddings(cfg, add_cls_token=self.add_cls_token, name="embeddings")(
            pixel_values,
            deterministic=deterministic,
            interpolate_pos_encoding=interpolate_pos_encoding,
        )
        x, all_hidden, all_attn = BaseViTEncoder(cfg, name="encoder")(
            x,
            attention_mask=attention_mask,
            deterministic=deterministic,
            output_attentions=output_attentions,
            output_hidden_states=output_hidden_states,
        )
        from msvit_tpu.models.base.norm import LayerNorm

        x = LayerNorm(
            epsilon=cfg.layer_norm_eps,
            out_dtype=cfg.policy.output,
            param_dtype=cfg.policy.param,
            name="layernorm",
        )(x)

        pooled = None
        if self.add_pooler:
            pooled = nn.Dense(
                cfg.hidden_size,
                kernel_init=trunc_normal_init(cfg.initializer_range),
                dtype=cfg.policy.compute,
                param_dtype=cfg.policy.param,
                name="pooler_dense",
            )(x[:, 0])
            pooled = jnp.tanh(pooled).astype(cfg.policy.output)

        return {
            "last_hidden_state": x,
            "pooler_output": pooled,
            "hidden_states": all_hidden,
            "attentions": all_attn,
        }


class ViTForImageClassification(nn.Module):
    """ViT + linear classification head on the CLS token (the standard HF
    head; the subsample family has its own richer head, see
    `msvit_tpu.models.subsample`)."""

    config: BaseViTConfig
    num_labels: int = 1000

    @nn.compact
    def __call__(
        self,
        pixel_values: jnp.ndarray,
        deterministic: bool = True,
        interpolate_pos_encoding: bool = False,
    ) -> jnp.ndarray:
        cfg = self.config
        out = ViTModel(cfg, name="vit")(
            pixel_values,
            deterministic=deterministic,
            interpolate_pos_encoding=interpolate_pos_encoding,
        )
        logits = nn.Dense(
            self.num_labels,
            kernel_init=trunc_normal_init(cfg.initializer_range),
            dtype=cfg.policy.compute,
            param_dtype=cfg.policy.param,
            name="classifier",
        )(out["last_hidden_state"][:, 0])
        return logits.astype(jnp.float32)
