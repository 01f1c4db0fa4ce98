"""Predictive encoder (flax.linen).

Behavioral counterpart of `model/predictive_encoder/modeling_spvitencoder.py`:

* continuous glimpse tokenizer: an affine transform per glimpse (built
  from the dof vector, `:239-272`) maps a P×P grid into the image;
  bicubic border-padded sampling (`:274-292`); a 5-layer SiLU conv encoder
  to a 1024-latent then Dense→D (`:193-206`); BatchNorm over tokens
  (`:294-315`);
* linear position encoder (dof→D) and decoder (D→dof with sigmoid +
  config scaling; optional rowspace-orthogonal component, `:115-146`);
* forward (`:644-708`): per-image context length ~ Geometric(1/E[ctx]),
  embed [CLS, ctx…, PRD], run the base trunk under a mask exposing only
  CLS + the first Lᵢ contexts + PRD, BatchNorm the output.

TPU-first deltas:
* static token axis: lengths are sampled then clamped to the configured
  `max_context_length` (the reference sizes the axis by the batch max —
  a data-dependent shape XLA can't trace; SURVEY §7 "hard parts");
* BatchNorm(affine=False) in train mode is a pure standardization over
  (batch, tokens) per feature — implemented functionally, no running
  state (the reference only ever trains, `sandbox/predictive.py`);
* glimpse sampling uses `msvit_tpu.ops.grid_sample` (one fused gather)
  instead of vmapped torch grid_sample;
* the reference's tensor-truthiness bug at `:122`
  (`if self.position_decoder.bias:`) is implemented as intended:
  add the bias when `pe_bias` is set.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from msvit_tpu.models.base.model import BaseViTEncoder, trunc_normal_init
from msvit_tpu.models.predictive.config import PredictiveViTConfig
from msvit_tpu.ops.grid_sample import grid_sample


def batch_norm(x: jnp.ndarray, axes: Tuple[int, ...], eps: float = 1e-5):
    """Train-mode BatchNorm1d(affine=False): standardize per-feature over
    `axes` (reference `modeling_spvitencoder.py:191,294-315,693`)."""
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _config_scale(config: PredictiveViTConfig):
    """Resolve patch_config_scale to (scale, shift) arrays of shape [dof]."""
    s = config.patch_config_scale
    if isinstance(s, (int, float)):
        return jnp.full((config.dof,), float(s)), jnp.zeros((config.dof,))
    arr = np.asarray(s, dtype=np.float32)[: config.dof]  # [dof, 2]
    return jnp.asarray(arr[:, 0]), jnp.asarray(arr[:, 1])


def geometric_lengths(key, shape, expected: float, max_len: int):
    """Context lengths ~ Geometric(1/expected) on {1,2,…}, clamped to the
    static bound (reference `modeling_spvitencoder.py:672`)."""
    p = 1.0 / expected
    u = jax.random.uniform(key, shape, minval=1e-7, maxval=1.0)
    k = jnp.floor(jnp.log(u) / jnp.log1p(-p)).astype(jnp.int32) + 1
    return jnp.clip(k, 1, max_len)


class PredictiveViTPatchEmbeddings(nn.Module):
    """Glimpse tokenizer (reference `modeling_spvitencoder.py:170-315`)."""

    config: PredictiveViTConfig

    def setup(self):
        cfg = self.config
        p = cfg.patch_size
        init = trunc_normal_init(cfg.initializer_range)
        conv = lambda f, k, s, pad, name: nn.Conv(  # noqa: E731
            f,
            (k, k),
            strides=(s, s),
            padding=pad,
            kernel_init=init,
            dtype=cfg.policy.compute,
            param_dtype=cfg.policy.param,
            name=name,
        )
        # 5-layer SiLU conv encoder P → 1 (reference `:193-206`)
        self.enc_convs = [
            conv(64, 5, 1, [(2, 2), (2, 2)], "enc0"),
            conv(128, 4, 2, [(1, 1), (1, 1)], "enc1"),
            conv(256, 4, 2, [(1, 1), (1, 1)], "enc2"),
            conv(512, 4, 2, [(1, 1), (1, 1)], "enc3"),
            conv(1024, p // 8, 1, "VALID", "enc4"),
        ]
        self.enc_dense = nn.Dense(
            cfg.hidden_size,
            kernel_init=init,
            dtype=cfg.policy.compute,
            param_dtype=cfg.policy.param,
            name="enc_dense",
        )
        # mirror ConvTranspose decoder (reference `:208-221`); same shapes
        # as torch (output-size parity), lax transposed-conv padding rules
        convt = lambda f, k, s, pad, name: nn.ConvTranspose(  # noqa: E731
            f,
            (k, k),
            strides=(s, s),
            padding=pad,
            kernel_init=init,
            dtype=cfg.policy.compute,
            param_dtype=cfg.policy.param,
            name=name,
        )
        self.dec_dense = nn.Dense(
            1024,
            kernel_init=init,
            dtype=cfg.policy.compute,
            param_dtype=cfg.policy.param,
            name="dec_dense",
        )
        self.dec_convs = [
            convt(512, p // 8, 1, "VALID", "dec0"),
            convt(256, 4, 2, "SAME", "dec1"),
            convt(128, 4, 2, "SAME", "dec2"),
            convt(64, 4, 2, "SAME", "dec3"),
            convt(cfg.num_channels, 5, 1, "SAME", "dec4"),
        ]

    def grid_sample_points(
        self, patch_config: jnp.ndarray, bbox_only: bool = False
    ) -> jnp.ndarray:
        """Affine sample grid from the dof vector
        (reference `modeling_spvitencoder.py:239-272`).  Returns points in
        the reference's (y, x)-flipped convention, [..., P(or 2), P(or 2), 2]."""
        cfg = self.config
        p = cfg.patch_size
        bsz = patch_config.shape[:-1]
        if cfg.patch_config == "translation":
            diag = jnp.full(bsz + (2,), cfg.default_patch_scale)
        elif cfg.patch_config == "scaling":
            diag = jnp.exp(patch_config[..., 2:3]) * jnp.ones(bsz + (2,))
        elif cfg.patch_config == "non-uniform-scaling":
            diag = jnp.exp(jnp.minimum(patch_config[..., 2:4], 0.0))
        else:
            raise ValueError(cfg.patch_config)

        # scale-restricted translation (reference `:262-263`)
        t = (1.0 - diag) * patch_config[..., :2]  # [..., 2]

        if bbox_only:
            lin = jnp.asarray([-1.0, 1.0])
        else:
            lin = jnp.linspace(-1.0, 1.0, p)
        g0, g1 = jnp.meshgrid(lin, lin, indexing="ij")
        pts = jnp.stack([g0, g1], axis=-1)  # [P,P,2]
        return pts * diag[..., None, None, :] + t[..., None, None, :]

    def _axis_coords(self, patch_config: jnp.ndarray):
        """Per-axis sample coordinates (ys, xs) [..., P] — the glimpse
        lattice is axis-separable (translation + diagonal scaling only)."""
        cfg = self.config
        p = cfg.patch_size
        bsz = patch_config.shape[:-1]
        if cfg.patch_config == "translation":
            diag = jnp.full(bsz + (2,), cfg.default_patch_scale)
        elif cfg.patch_config == "scaling":
            diag = jnp.exp(patch_config[..., 2:3]) * jnp.ones(bsz + (2,))
        elif cfg.patch_config == "non-uniform-scaling":
            diag = jnp.exp(jnp.minimum(patch_config[..., 2:4], 0.0))
        else:
            raise ValueError(cfg.patch_config)
        t = (1.0 - diag) * patch_config[..., :2]
        lin = jnp.linspace(-1.0, 1.0, p)
        ys = lin * diag[..., 0:1] + t[..., 0:1]
        xs = lin * diag[..., 1:2] + t[..., 1:2]
        return ys, xs

    def position_to_patch(
        self, pixel_values: jnp.ndarray, patch_config: jnp.ndarray
    ) -> jnp.ndarray:
        """Bicubic border-padded glimpse extraction (reference `:274-292`)
        via the separable matmul sampler (axis-aligned lattices — see
        ops/grid_sample.py).  pixel_values [B,H,W,C]; patch_config
        [B, N..., dof] → patches [B, N..., P, P, C]."""
        ys, xs = self._axis_coords(patch_config)
        from msvit_tpu.ops.grid_sample import grid_sample_separable

        return grid_sample_separable(pixel_values, ys, xs, "bicubic", "border")

    def patch_to_latent(self, patches: jnp.ndarray) -> jnp.ndarray:
        """[..., P, P, C] → [..., D] (reference `:223-229`)."""
        cfg = self.config
        lead = patches.shape[:-3]
        x = patches.reshape((-1,) + patches.shape[-3:]).astype(cfg.policy.compute)
        for c in self.enc_convs:
            x = jax.nn.silu(c(x))
        x = x.reshape(x.shape[0], -1)  # [B*, 1024]
        x = self.enc_dense(x)
        return x.reshape(lead + (cfg.hidden_size,))

    def latent_to_patch(self, latent: jnp.ndarray) -> jnp.ndarray:
        """[..., D] → [..., P, P, C] (reference `:231-237`)."""
        cfg = self.config
        lead = latent.shape[:-1]
        x = latent.reshape((-1, latent.shape[-1])).astype(cfg.policy.compute)
        x = self.dec_dense(x)[:, None, None, :]  # [B*,1,1,1024]
        for c in self.dec_convs:
            x = c(jax.nn.silu(x))  # SiLU precedes every deconv; none after
        return x.reshape(lead + x.shape[-3:])

    def __call__(
        self, pixel_values: jnp.ndarray, patch_config: jnp.ndarray
    ) -> jnp.ndarray:
        """Sample → encode → BatchNorm over tokens (reference `:294-315`)."""
        patches = self.position_to_patch(pixel_values, patch_config)
        emb = self.patch_to_latent(patches)  # [B, N, D]
        return batch_norm(emb.astype(jnp.float32), axes=(0, 1)).astype(emb.dtype)


class PredictiveViTModel(nn.Module):
    """Embeddings + trunk + output BatchNorm
    (reference `modeling_spvitencoder.py:79-167,485-708`)."""

    config: PredictiveViTConfig

    def setup(self):
        cfg = self.config
        init = trunc_normal_init(cfg.initializer_range)
        self.patch_embeddings = PredictiveViTPatchEmbeddings(
            cfg, name="patch_embeddings"
        )
        self.position_encoder = nn.Dense(
            cfg.hidden_size,
            use_bias=cfg.pe_bias,
            kernel_init=init,
            dtype=cfg.policy.compute,
            param_dtype=cfg.policy.param,
            name="position_encoder",
        )
        # position decoder params are declared directly (not nn.Dense) so
        # latent_to_position can form the rowspace projection / pinv
        # (reference `:115-146`) without touching submodule variables
        self.pd_kernel = self.param(
            "position_decoder_kernel", init, (cfg.hidden_size, cfg.dof)
        )
        self.pd_bias = (
            self.param("position_decoder_bias", nn.initializers.zeros, (cfg.dof,))
            if cfg.pe_bias
            else None
        )
        self.cls_token = self.param(
            "cls_token", trunc_normal_init(cfg.initializer_range), (cfg.hidden_size,)
        )
        self.prd_token = self.param(
            "prd_token", trunc_normal_init(cfg.initializer_range), (cfg.hidden_size,)
        )
        self.encoder = BaseViTEncoder(cfg, name="encoder")

    def sample_initial(self, key, shape: Tuple[int, ...]) -> jnp.ndarray:
        """Uniform dof samples in [-1,1], config-scaled
        (reference `:97-113`)."""
        cfg = self.config
        u = jax.random.uniform(
            key, shape + (cfg.dof,), minval=-1.0, maxval=1.0
        )
        scale, shift = _config_scale(cfg)
        return u * scale + shift

    def latent_to_position(
        self, x: jnp.ndarray, return_orthogonal: bool = False
    ):
        """Decode latent → sigmoid → scaled position; optionally the
        component of x orthogonal to the decoder rowspace
        (reference `:115-146`)."""
        cfg = self.config
        kernel = self.pd_kernel.astype(jnp.float32)  # [D, dof]
        proj = x.astype(jnp.float32) @ kernel
        y = proj
        if self.pd_bias is not None:
            y = y + self.pd_bias
        y = jax.nn.sigmoid(y)
        scale, shift = _config_scale(cfg)
        y = y * scale + shift
        if return_orthogonal:
            # pinv(K) for a full-column-rank [D, dof] kernel via normal
            # equations — exact, and avoids differentiating an SVD on TPU
            # (dof is 2–4, so the solve is dof×dof)
            gram = kernel.T @ kernel  # [dof, dof]
            pinv = jnp.linalg.solve(gram, kernel.T)  # [dof, D]
            orthogonal = x.astype(jnp.float32) - proj @ pinv
            return y, orthogonal
        return y, None

    def embed(
        self, pixel_values: jnp.ndarray, patch_config: jnp.ndarray
    ) -> jnp.ndarray:
        """Patch + position embeddings, concat [CLS, ctx…, PRD]
        (reference `:148-167`)."""
        cfg = self.config
        patch_emb = self.patch_embeddings(pixel_values, patch_config)
        pos_emb = self.position_encoder(patch_config.astype(cfg.policy.compute))
        emb = patch_emb + pos_emb
        b = pixel_values.shape[0]
        cls = jnp.broadcast_to(self.cls_token, (b, 1, cfg.hidden_size))
        prd = jnp.broadcast_to(self.prd_token, (b, 1, cfg.hidden_size))
        return jnp.concatenate([cls.astype(emb.dtype), emb, prd.astype(emb.dtype)], axis=1)

    def __call__(
        self,
        pixel_values: jnp.ndarray,  # [B, H, W, C]
        rng: Optional[jax.Array] = None,
        context_lengths: Optional[jnp.ndarray] = None,
        patch_config: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        output_inputs: bool = False,
    ) -> Dict[str, Any]:
        cfg = self.config
        b = pixel_values.shape[0]
        if rng is None and (context_lengths is None or patch_config is None):
            rng = self.make_rng("glimpse")
        if context_lengths is None:
            rng, k = jax.random.split(rng)
            context_lengths = geometric_lengths(
                k, (b,), cfg.expected_context_length, cfg.max_context_length
            )
        if patch_config is None:
            rng, k = jax.random.split(rng)
            patch_config = self.sample_initial(k, (b, cfg.max_context_length))

        if self.is_initializing():
            # the deconv decoder is only reached through the loss library
            # (`losses.py`), so touch it once here to create its params
            self.patch_embeddings.latent_to_patch(
                jnp.zeros((1, cfg.hidden_size), cfg.policy.compute)
            )

        embeddings = self.embed(pixel_values, patch_config)  # [B, maxN+2, D]

        # mask exposing [CLS?] + first L_i contexts + PRD
        # (reference `:678-681`)
        n = cfg.max_context_length
        k_idx = jnp.arange(n + 2)
        mask = (k_idx[None] <= context_lengths[:, None]) | (k_idx[None] == n + 1)
        if not cfg.use_cls_token:
            mask = mask.at[:, 0].set(False)

        out, all_hidden, all_attn = self.encoder(
            embeddings,
            attention_mask=mask[:, None, None, :],
            deterministic=deterministic,
        )
        out = batch_norm(out.astype(jnp.float32), axes=(0, 1)).astype(out.dtype)

        return {
            "input_position": patch_config,
            "input_hidden_state": embeddings if output_inputs else None,
            "context_lengths": context_lengths,
            "last_hidden_state": out,
            "hidden_states": all_hidden,
            "attentions": all_attn,
        }
