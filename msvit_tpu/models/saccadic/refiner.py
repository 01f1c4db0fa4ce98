"""Saccadic transformer refiner.

* ``QuadraticSelfAttention`` — attention whose scores add a negative
  squared-distance term through a shared `distance` projection (RBF-like;
  reference `modeling_quadratic_attention.py:13-76`).
* ``SaccadicViTLayer``/``SaccadicViTEncoder`` — **post-LN-only** blocks
  (`layernorm_before` is commented out upstream,
  `modeling_transformer_predictor.py:167,178`): x += attn(x);
  x = mlp(LN(x)) + x.
* ``TransformerSaccadicViTPredictor`` — per-pattern learned CLS tokens,
  a block mask connecting each pattern token to its matched hidden nodes
  (+ identity), encode [tokens ++ pattern tokens]
  (reference `modeling_transformer_predictor.py:273-364`; the undefined
  `hidden_states` at `:300` is the documented upstream bug — the intent,
  `_hidden_states`, is implemented).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from msvit_tpu.models.base.model import trunc_normal_init
from msvit_tpu.models.saccadic.config import SaccadicViTConfig
from msvit_tpu.ops.attention import DEFAULT_MASK_VALUE, multi_head_attention


class QuadraticSelfAttention(nn.Module):
    """scores = (QKᵀ − ½‖dist(q)−dist(k)‖²)/√Dh."""

    config: SaccadicViTConfig

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,  # bool [..., Nq, Nk]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        h, dh = cfg.num_attention_heads, cfg.head_dim
        compute = cfg.policy.compute
        init = trunc_normal_init(cfg.initializer_range)

        def proj(name, use_bias=True):
            return nn.Dense(
                h * dh,
                use_bias=use_bias,
                kernel_init=init,
                dtype=compute,
                param_dtype=cfg.policy.param,
                name=name,
            )

        def heads(x):
            return jnp.swapaxes(
                x.reshape(x.shape[:-1] + (h, dh)), -3, -2
            )  # [..., H, N, Dh]

        x = hidden_states.astype(compute)
        q = heads(proj("query")(x))
        k = heads(proj("key")(x))
        v = heads(proj("value")(x))
        dq = heads(proj("distance", use_bias=False)(x)).astype(jnp.float32)
        dk = dq  # same projection of the same states

        # −½‖dq_i − dk_j‖² = dq·dk − ½(‖dq‖² + ‖dk‖²)
        sq_q = 0.5 * jnp.sum(dq**2, -1)
        quad = (
            jnp.einsum("...qd,...kd->...qk", dq, dk)
            - sq_q[..., :, None]
            - sq_q[..., None, :]
        )
        lin = jnp.einsum(
            "...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32
        )
        scores = (quad + lin) / (dh**0.5)
        if attention_mask is not None:
            scores = jnp.where(
                attention_mask[..., None, :, :], scores, DEFAULT_MASK_VALUE
            )
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        out = jnp.einsum(
            "...qk,...kd->...qd",
            probs.astype(v.dtype),
            v,
            preferred_element_type=jnp.float32,
        ).astype(compute)
        return jnp.swapaxes(out, -3, -2).reshape(hidden_states.shape[:-1] + (h * dh,))


class EagerSelfAttention(nn.Module):
    """Standard MHSA (reference "eager" refiner option)."""

    config: SaccadicViTConfig

    @nn.compact
    def __call__(self, hidden_states, attention_mask=None, deterministic=True):
        cfg = self.config
        h, dh = cfg.num_attention_heads, cfg.head_dim
        compute = cfg.policy.compute
        init = trunc_normal_init(cfg.initializer_range)
        x = hidden_states.astype(compute)

        def heads(x_):
            return jnp.swapaxes(x_.reshape(x_.shape[:-1] + (h, dh)), -3, -2)

        q = heads(nn.Dense(h * dh, kernel_init=init, dtype=compute,
                           param_dtype=cfg.policy.param, name="query")(x))
        k = heads(nn.Dense(h * dh, kernel_init=init, dtype=compute,
                           param_dtype=cfg.policy.param, name="key")(x))
        v = heads(nn.Dense(h * dh, kernel_init=init, dtype=compute,
                           param_dtype=cfg.policy.param, name="value")(x))
        mask = (
            attention_mask[..., None, :, :] if attention_mask is not None else None
        )
        out, _ = multi_head_attention(q, k, v, mask=mask, implementation="xla")
        return jnp.swapaxes(out, -3, -2).reshape(
            hidden_states.shape[:-1] + (h * dh,)
        )


class SaccadicViTLayer(nn.Module):
    """Post-LN-only block (reference `modeling_transformer_predictor.py:157-198`)."""

    config: SaccadicViTConfig

    @nn.compact
    def __call__(self, hidden_states, attention_mask=None, deterministic=True):
        cfg = self.config
        attn_cls = (
            QuadraticSelfAttention
            if cfg.refiner_attention == "quadratic"
            else EagerSelfAttention
        )
        attn_out = attn_cls(cfg, name="attention")(
            hidden_states, attention_mask, deterministic
        )
        attn_out = nn.Dense(
            cfg.hidden_size,
            kernel_init=trunc_normal_init(cfg.initializer_range),
            dtype=cfg.policy.compute,
            param_dtype=cfg.policy.param,
            name="output_dense",
        )(attn_out)
        hidden_states = attn_out + hidden_states

        from msvit_tpu.models.base.norm import LayerNorm

        x = LayerNorm(
            epsilon=cfg.layer_norm_eps,
            out_dtype=cfg.policy.compute,
            param_dtype=cfg.policy.param,
            name="layernorm_after",
        )(hidden_states)
        x = nn.Dense(
            cfg.mlp_hidden_size,
            kernel_init=trunc_normal_init(cfg.initializer_range),
            dtype=cfg.policy.compute,
            param_dtype=cfg.policy.param,
            name="intermediate",
        )(x.astype(cfg.policy.compute))
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(
            cfg.hidden_size,
            kernel_init=trunc_normal_init(cfg.initializer_range),
            dtype=cfg.policy.compute,
            param_dtype=cfg.policy.param,
            name="output",
        )(x)
        return x + hidden_states


class SaccadicViTEncoder(nn.Module):
    config: SaccadicViTConfig

    @nn.compact
    def __call__(self, hidden_states, attention_mask=None, deterministic=True):
        for i in range(self.config.num_hidden_layers):
            hidden_states = SaccadicViTLayer(self.config, name=f"layer_{i}")(
                hidden_states, attention_mask, deterministic
            )
        return hidden_states


class TransformerSaccadicViTPredictor(nn.Module):
    """Refiner over [hidden tokens ++ matched pattern tokens]."""

    config: SaccadicViTConfig

    def setup(self):
        cfg = self.config
        self.cls_tokens = {
            k: self.param(
                f"cls_tokens_{k}",
                nn.initializers.normal(1.0),
                (v, cfg.hidden_size),
            )
            for k, v in cfg.num_patterns
        }
        self.encoder = SaccadicViTEncoder(cfg, name="encoder")

    def predicted_states(
        self,
        pattern: Dict[str, jnp.ndarray],
        log_covariance_shift: jnp.ndarray,
        prediction_method: str = "max",
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Conditional mean, or mean + explicit low-rank noise + implicit
        isotropic noise (reference `:312-321`)."""
        mean = pattern["conditional_mean"]  # [B,W,n_wild,D]
        if prediction_method == "max":
            return mean
        if prediction_method == "mean":
            assert rng is not None
            k1, k2 = jax.random.split(rng)
            cov = pattern["conditional_covariance"]
            eps = jax.random.normal(k1, mean.shape[:-1] + (cov.shape[-1], 1))
            explicit = (cov @ eps)[..., 0]
            implicit = jnp.exp(0.5 * log_covariance_shift) * jax.random.normal(
                k2, mean.shape
            )
            return mean + explicit + implicit
        raise ValueError(prediction_method)

    def __call__(
        self,
        hidden_states: jnp.ndarray,  # [B, N, D]
        context_states: jnp.ndarray,  # [B, C, D]
        patterns: Dict[Tuple[int, int], Dict[str, jnp.ndarray]],
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[Tuple[int, int], jnp.ndarray]]:
        cfg = self.config
        b, n, d = hidden_states.shape

        pattern_tokens = []
        mask_rows = []
        slices = [0]
        for (complexity, _n_wild), p in patterns.items():
            tok = self.cls_tokens[complexity][p["pattern_index"]]  # [B,W,D]
            pattern_tokens.append(tok)
            # pattern token attends to its matched *hidden* nodes (`:339`)
            matched = jnp.any(
                p["node_indices"][..., None] == jnp.arange(n)[None, None, None],
                axis=-2,
            )  # [B,W,N]
            mask_rows.append(matched)
            slices.append(slices[-1] + tok.shape[1])

        pattern_tokens = jnp.concatenate(pattern_tokens, axis=1)  # [B,P,D]
        a = jnp.concatenate(mask_rows, axis=1)  # [B,P,N]
        n_p = pattern_tokens.shape[1]

        # [[False(N,N), Aᵀ], [A, I]] (reference `:349-353`)
        top = jnp.concatenate(
            [jnp.zeros((b, n, n), bool), jnp.swapaxes(a, 1, 2)], axis=-1
        )
        bottom = jnp.concatenate(
            [a, jnp.broadcast_to(jnp.eye(n_p, dtype=bool), (b, n_p, n_p))],
            axis=-1,
        )
        mask = jnp.concatenate([top, bottom], axis=1)

        all_tokens = jnp.concatenate(
            [hidden_states, pattern_tokens.astype(hidden_states.dtype)], axis=1
        )
        encoded = self.encoder(all_tokens, mask, deterministic)

        encoded_hidden = encoded[:, :n]
        out: Dict[Tuple[int, int], jnp.ndarray] = {}
        for i, key in enumerate(patterns.keys()):
            out[key] = encoded[:, n + slices[i] : n + slices[i + 1]]
        return encoded_hidden, out
