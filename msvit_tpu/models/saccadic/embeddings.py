"""Saccadic glimpse embeddings — the single-glimpse (N-free) version of the
predictive tokenizer (reference `modeling_scvitencoder.py:73-183`):
affine grid from the dof vector, bicubic zero-padded sampling, a stride-P
conv projection (≡ one matmul over the flattened glimpse), plus linear
position encoder/decoder.  `sample_initial` is the image center (zeros)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from msvit_tpu.models.base.model import trunc_normal_init
from msvit_tpu.models.saccadic.config import SaccadicViTConfig
from msvit_tpu.ops.grid_sample import grid_sample


class SaccadicViTPatchEmbeddings(nn.Module):
    config: SaccadicViTConfig

    def grid_points(self, patch_config: jnp.ndarray) -> jnp.ndarray:
        """Affine glimpse grid (reference `:149-176`): translation places
        the P×P grid at t; scaling multiplies by exp(s); non-uniform
        scaling by diag(exp(s_y), exp(s_x)).  Unlike the predictive
        tokenizer there is no scale-restricted translation or clamping.
        Returns (y, x)-ordered points [..., P, P, 2]."""
        cfg = self.config
        p = cfg.patch_size
        bsz = patch_config.shape[:-1]
        if cfg.patch_config == "translation":
            diag = jnp.ones(bsz + (2,))
        elif cfg.patch_config == "scaling":
            diag = jnp.exp(patch_config[..., 2:3]) * jnp.ones(bsz + (2,))
        elif cfg.patch_config == "non-uniform-scaling":
            diag = jnp.exp(patch_config[..., 2:4])
        else:
            raise ValueError(cfg.patch_config)
        t = patch_config[..., :2]
        lin = jnp.linspace(-1.0, 1.0, p)
        g0, g1 = jnp.meshgrid(lin, lin, indexing="ij")
        pts = jnp.stack([g0, g1], axis=-1)  # [P, P, 2]
        return pts * diag[..., None, None, :] + t[..., None, None, :]

    def axis_coords(self, patch_config: jnp.ndarray):
        """(ys, xs) [..., P] — glimpses are axis-separable lattices."""
        cfg = self.config
        p = cfg.patch_size
        bsz = patch_config.shape[:-1]
        if cfg.patch_config == "translation":
            diag = jnp.ones(bsz + (2,))
        elif cfg.patch_config == "scaling":
            diag = jnp.exp(patch_config[..., 2:3]) * jnp.ones(bsz + (2,))
        elif cfg.patch_config == "non-uniform-scaling":
            diag = jnp.exp(patch_config[..., 2:4])
        else:
            raise ValueError(cfg.patch_config)
        t = patch_config[..., :2]
        lin = jnp.linspace(-1.0, 1.0, p)
        return lin * diag[..., 0:1] + t[..., 0:1], lin * diag[..., 1:2] + t[..., 1:2]

    @nn.compact
    def __call__(
        self,
        pixel_values: jnp.ndarray,  # [B, H, W, C] NHWC
        patch_config: jnp.ndarray,  # [B, ...glimpse dims..., dof]
    ) -> jnp.ndarray:  # [B, ..., D]
        cfg = self.config
        from msvit_tpu.ops.grid_sample import grid_sample_separable

        ys, xs = self.axis_coords(patch_config)
        patches = grid_sample_separable(pixel_values, ys, xs, "bicubic", "zeros")
        lead = patches.shape[:-3]
        flat = patches.reshape(lead + (-1,))
        return nn.Dense(
            cfg.hidden_size,
            kernel_init=trunc_normal_init(cfg.initializer_range),
            dtype=cfg.policy.compute,
            param_dtype=cfg.policy.param,
            name="projection",
        )(flat.astype(cfg.policy.compute))


class SaccadicViTEmbeddings(nn.Module):
    """Patch + position embedding; linear position decoder
    (reference `modeling_scvitencoder.py:73-109`)."""

    config: SaccadicViTConfig

    def setup(self):
        cfg = self.config
        init = trunc_normal_init(cfg.initializer_range)
        self.patch_embeddings = SaccadicViTPatchEmbeddings(
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
        self.position_decoder = nn.Dense(
            cfg.dof,
            use_bias=cfg.pe_bias,
            kernel_init=init,
            dtype=jnp.float32,
            param_dtype=cfg.policy.param,
            name="position_decoder",
        )

    def sample_initial(self) -> jnp.ndarray:
        """Center glimpse (reference `:89-95`)."""
        return jnp.zeros((self.config.dof,))

    def decode_position(self, latent: jnp.ndarray) -> jnp.ndarray:
        return self.position_decoder(latent.astype(jnp.float32))

    def __call__(
        self, pixel_values: jnp.ndarray, patch_config: jnp.ndarray
    ) -> jnp.ndarray:
        if self.is_initializing():
            # the decoder is only reached through decode_position; touch it
            # once so init creates its params
            self.position_decoder(jnp.zeros((1, self.config.hidden_size)))
        emb = self.patch_embeddings(pixel_values, patch_config)
        pos = self.position_encoder(
            patch_config.astype(self.config.policy.compute)
        )
        return emb + pos
