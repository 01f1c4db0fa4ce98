"""Mixture-of-Experts FFN (token-choice top-1) with expert parallelism.

Capability extension beyond the reference (whose MLPs are dense): an
optional drop-in replacement for the trunk's FFN that shards its expert
axis over the "model" mesh axis (`parallel/sharding.py` places
`experts_in`/`experts_out` kernels with the expert dim partitioned) —
the "ep" in the dp/tp/sp/pp/ep coverage of `__graft_entry__`.

Design: token-choice top-1 routing with a load-balancing auxiliary loss
(Switch-style), computed as dense einsums over the expert axis — XLA
partitions the expert dimension and turns the one-hot dispatch into
all-to-all-free masked compute.  At the framework's scales (≤ a few
experts) this dense form beats gather/scatter dispatch on TPU.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from msvit_tpu.models.base.config import BaseViTConfig
from msvit_tpu.models.base.model import trunc_normal_init


class MoEFFN(nn.Module):
    """Top-1 token-choice MoE GELU FFN."""

    config: BaseViTConfig
    num_experts: int = 4

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x [..., N, D] → (out [..., N, D], aux load-balance loss [])."""
        cfg = self.config
        compute = cfg.policy.compute
        d, f, e = cfg.hidden_size, cfg.mlp_hidden_size, self.num_experts
        init = trunc_normal_init(cfg.initializer_range)

        router = nn.Dense(
            e,
            kernel_init=init,
            dtype=jnp.float32,
            param_dtype=cfg.policy.param,
            name="router",
        )
        w_in = self.param("experts_in", init, (e, d, f))
        b_in = self.param("experts_in_bias", nn.initializers.zeros, (e, f))
        w_out = self.param("experts_out", init, (e, f, d))
        b_out = self.param("experts_out_bias", nn.initializers.zeros, (e, d))

        logits = router(x.astype(jnp.float32))  # [..., N, E]
        probs = jax.nn.softmax(logits, axis=-1)
        expert = jnp.argmax(probs, axis=-1)  # [..., N]
        onehot = jax.nn.one_hot(expert, e, dtype=jnp.float32)
        gate = jnp.sum(probs * onehot, axis=-1)  # [..., N]

        # Switch load-balancing aux: E · Σ_e fraction_e · router_prob_e
        frac = jnp.mean(onehot.reshape(-1, e), axis=0)
        prob_mean = jnp.mean(probs.reshape(-1, e), axis=0)
        aux = e * jnp.sum(frac * prob_mean)

        xc = x.astype(compute)
        h = (
            jnp.einsum("...nd,edf->...nef", xc, w_in.astype(compute))
            + b_in.astype(compute)
        )
        h = jax.nn.gelu(h, approximate=False)
        out_e = (
            jnp.einsum("...nef,efd->...ned", h, w_out.astype(compute))
            + b_out.astype(compute)
        )
        out = jnp.einsum(
            "...ned,...ne->...nd", out_e, (onehot * gate[..., None]).astype(compute)
        )
        return out, aux
