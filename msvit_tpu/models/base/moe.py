"""Mixture-of-Experts FFN (token-choice top-1) with expert parallelism.

Capability extension beyond the reference (whose MLPs are dense —
`model/base_encoder/modeling_base.py:238-260`): an optional drop-in
replacement for the trunk's FFN that shards its expert axis over the
"model" mesh axis (`parallel/sharding.py` places `experts_in`/
`experts_out` kernels with the expert dim partitioned) — the "ep" in the
dp/tp/sp/pp/ep coverage of `__graft_entry__`.

Two implementations, selected by ``BaseViTConfig.moe_impl``:

* ``"dispatch"`` (default) — real capacity-bounded token dispatch in the
  Switch-Transformer / Mesh-TF style: each token is routed to its top-1
  expert, takes a slot in that expert's queue of static capacity
  ``C = ceil(capacity_factor · N / E)`` (per image), and tokens beyond
  capacity are dropped (their FFN output is zero; the residual connection
  carries them).  Dispatch and combine are one-hot **matmuls** rather
  than gather/scatter — on TPU this keeps everything on the MXU with
  static shapes, and under expert-parallel sharding XLA partitions the
  per-expert GEMMs ([E, C, D] × [E, D, F]) locally and inserts the
  collectives for the dispatch/combine contractions.  Per-expert FLOPs
  are O(C·D·F), NOT O(N·E·D·F): each expert computes only its queue.
* ``"dense"`` — computes all experts for every token and masks
  (O(E) FLOPs/token).  Cheaper below ~4 experts at tiny scale and useful
  as the equivalence oracle for the dispatched path
  (tests/test_moe.py::test_dispatch_matches_dense).
"""

from __future__ import annotations

import math
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
        if cfg.moe_impl == "dense":
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
                "...ned,...ne->...nd",
                out_e,
                (onehot * gate[..., None]).astype(compute),
            )
            return out, aux

        # --- dispatched path ---
        n = x.shape[-2]
        cap = max(1, math.ceil(cfg.moe_capacity_factor * n / e))
        cap = min(cap, n)  # a queue longer than the group is pure padding

        # Queue position of each token within its expert (1-indexed at its
        # expert's column, 0 elsewhere); tokens whose position exceeds the
        # capacity are dropped — exactly Switch's overflow semantics.
        pos = jnp.cumsum(onehot, axis=-2) * onehot  # [..., N, E]
        kept = onehot * (pos <= cap)
        slot = jnp.sum(pos * onehot, axis=-1) - 1.0  # [..., N] 0-indexed
        slot_oh = jax.nn.one_hot(slot, cap, dtype=jnp.float32)  # [..., N, C]

        # dispatch[..., n, e, c] = 1 iff token n sits in expert e's slot c
        dispatch = (kept[..., :, :, None] * slot_oh[..., :, None, :]).astype(
            compute
        )
        expert_in = jnp.einsum(
            "...nec,...nd->...ecd", dispatch, xc
        )  # [..., E, C, D]
        h = (
            jnp.einsum("...ecd,edf->...ecf", expert_in, w_in.astype(compute))
            + b_in.astype(compute)[:, None, :]
        )
        h = jax.nn.gelu(h, approximate=False)
        out_e = (
            jnp.einsum("...ecf,efd->...ecd", h, w_out.astype(compute))
            + b_out.astype(compute)[:, None, :]
        )
        combine = dispatch * gate[..., :, None, None].astype(compute)
        out = jnp.einsum("...nec,...ecd->...nd", combine, out_e)
        return out, aux
