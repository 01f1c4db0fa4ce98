"""Base ViT trunk (flax.linen).

Behavioral counterpart of the reference's `model/base_encoder/modeling_base.py`:

* pre-LN blocks: ``x += droppath(ls1·attn(LN1(x)))``;
  ``x += droppath(ls2·mlp(LN2(x)))``  (reference `modeling_base.py:314-345`);
* cross-context attention: optional per-layer ``context_states`` are
  concatenated onto K/V only — queries always come from the hidden tokens
  (reference `modeling_base.py:77-82`);
* masks: bool (True = attend) or additive float, applied to the scores
  (reference `modeling_base.py:89-93`);
* DINOv2 layer scale (`modeling_base.py:222-228`), stochastic depth
  (`modeling_base.py:232-250`), GELU MLP / SwiGLU FFN
  (`modeling_base.py:253-286`).

TPU-first choices:

* fused QKV projection: one ``[D, 3, H, Dh]`` parameter → one MXU matmul
  instead of three; the context branch reuses its K/V slice.
* attention dispatches through ``msvit_tpu.ops.attention`` (Pallas flash
  kernel when probabilities aren't requested).
* LayerNorms run in float32; matmuls in the policy compute dtype (bf16).
* optional `jax.checkpoint` rematerialization per block (config.remat).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from msvit_tpu.models.base.config import BaseViTConfig
from msvit_tpu.ops.attention import _on_tpu, multi_head_attention


def _packed_available() -> bool:
    return _on_tpu()


def trunc_normal_init(std: float):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class BaseViTSelfAttention(nn.Module):
    """MHSA with cross-context K/V and bool/additive masks."""

    config: BaseViTConfig

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        context_states: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        output_attentions: bool = False,
        banded_segments=None,  # ops.banded_attention.BandedSegments
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        cfg = self.config
        d, h, dh = cfg.hidden_size, cfg.num_attention_heads, cfg.head_dim
        compute = cfg.policy.compute

        w_qkv = self.param(
            "qkv_kernel", trunc_normal_init(cfg.initializer_range), (d, 3, h, dh)
        )
        b_qkv = (
            self.param("qkv_bias", nn.initializers.zeros, (3, h, dh))
            if cfg.qkv_bias
            else None
        )

        x = hidden_states.astype(compute)

        # Packed fast path (plain self-attention, the bf16 serving/trunk
        # case): consume the QKV GEMM output directly in [B, N, 3D]
        # layout via the packed Pallas kernel — the conventional
        # [B,H,N,64] operands have a 64-element minor dim that cripples
        # HBM DMA on v5e (ops/packed_attention.py; 3.7 vs 8.3 ms/layer
        # at ViT-B bs512, 1648→2073 img/s e2e bf16).
        # Cluster-banded multistate path (ops/banded_attention.py): the
        # [S,S] mask is replaced by sorted segment ids; dead key blocks
        # are skipped entirely.  Same params and layout as the packed
        # path — only the kernel differs.
        use_banded = (
            banded_segments is not None
            and context_states is None
            and not output_attentions
            and x.ndim == 3
            and all(isinstance(s, int) for s in x.shape)
        )
        if banded_segments is not None and not use_banded:
            # never silently drop the cluster structure (the caller did
            # not pass a dense mask in banded mode)
            raise ValueError(
                "banded_segments requires plain self-attention without "
                "output_attentions and with static shapes"
            )
        use_packed = use_banded or (
            cfg.attn_implementation in ("auto", "packed")
            and context_states is None
            and not output_attentions
            and (attention_mask is None or attention_mask.ndim == 4)
            and x.ndim == 3
            # Pallas kernels are shape-specialized: under a symbolic
            # (shape-polymorphic jax.export) batch/token axis, route to
            # the XLA path — the kernel's grid and CostEstimate need
            # concrete ints
            and all(isinstance(d, int) for d in x.shape)
            and _packed_available()
        )
        if use_packed and not use_banded:
            from msvit_tpu.ops.packed_attention import (
                grouped_vmem_ok,
                packed_vmem_ok,
            )

            # the all-heads kernel holds every head's [N,N] scores in
            # VMEM at once; the head-grouped variant (grid over head
            # pairs, dp-scratch backward) extends coverage to the
            # mid/long regime incl. multistate's 816-token soft-masked
            # layers.  Beyond both, fall back to fused/flash (grid over
            # heads).  (The banded kernel holds only a [128,128] score
            # tile — no VMEM gate.)
            n_tok = x.shape[-2]
            eb = jnp.dtype(compute).itemsize
            has_mask = attention_mask is not None
            if has_mask and attention_mask.shape[-2:] != (n_tok, n_tok):
                use_packed = False  # not plain self-attention
            elif (
                cfg.attn_implementation == "auto"
                and has_mask
                and n_tok >= 512
            ):
                # masked mid/long regime: the per-head fused/flash
                # kernels beat the packed ones 1.5-2.2x at [8-32, 816]
                # (benchmarks/bench_attn816_race_r4.py: packed 16.9 /
                # flash 10.7 / fused 7.6 ms per 12 layers at bs8) — the
                # packed layout's win is the UNMASKED dense trunk
                # (ViT-B @197 bs512 headline).  Fall through to
                # multi_head_attention's auto (fused ≥512, flash beyond
                # VMEM).  Explicit "packed" still forces the kernel.
                use_packed = False
            else:
                use_packed = packed_vmem_ok(
                    n_tok, d, h, elem_bytes=eb, has_mask=has_mask
                ) or grouped_vmem_ok(n_tok, d, h, elem_bytes=eb,
                                     has_mask=has_mask)
        if use_packed:
            # fold the 1/sqrt(dh) attention scale into the q-third of the
            # projection (free in the GEMM) so the kernel skips a full
            # [N,N] f32 VPU pass per head (scale=1.0 is a trace-time
            # branch in ops/packed_attention.py)
            scale = dh**-0.5
            if cfg.qk_norm:
                # qk-norm composes with the packed/banded kernels
                # (VERDICT r4 item 3): the per-head LayerNorm is a row op
                # on the packed [B,N,3HD] GEMM output — same pattern as
                # the q-prescale fold.  The 1/sqrt(dh) fold moves AFTER
                # the norm (LN is scale-invariant, so pre-folding it into
                # the GEMM would be erased by the normalization); it
                # rides the LN's own scale multiply, which XLA fuses.
                wp = w_qkv.astype(compute).reshape(d, 3 * h * dh)
                qkvp = x @ wp
                if b_qkv is not None:
                    qkvp = qkvp + b_qkv.astype(compute).reshape(3 * h * dh)
                qkv4 = qkvp.reshape(qkvp.shape[:-1] + (3, h, dh))
                qn = nn.LayerNorm(
                    epsilon=cfg.layer_norm_eps, use_bias=False,
                    dtype=compute, param_dtype=cfg.policy.param,
                    name="q_norm",
                )(qkv4[..., 0, :, :])
                kn = nn.LayerNorm(
                    epsilon=cfg.layer_norm_eps, use_bias=False,
                    dtype=compute, param_dtype=cfg.policy.param,
                    name="k_norm",
                )(qkv4[..., 1, :, :])
                qkvp = jnp.stack(
                    [qn * scale, kn, qkv4[..., 2, :, :]], axis=-3
                ).reshape(qkvp.shape)
            else:
                qscale = jnp.asarray([scale, 1.0, 1.0], compute).reshape(
                    1, 3, 1, 1
                )
                wp = (w_qkv.astype(compute) * qscale).reshape(d, 3 * h * dh)
                qkvp = x @ wp
                if b_qkv is not None:
                    qkvp = qkvp + (
                        b_qkv.astype(compute) * qscale[0]
                    ).reshape(3 * h * dh)
            if use_banded:
                from msvit_tpu.ops.banded_attention import (
                    multistate_banded_attention,
                )

                out = multistate_banded_attention(qkvp, banded_segments, h)
            else:
                from msvit_tpu.ops.packed_attention import packed_attention

                out = packed_attention(
                    qkvp, h, mask=attention_mask, scale=1.0
                )
            if cfg.attention_probs_dropout_prob > 0.0 and not deterministic:
                out = nn.Dropout(cfg.attention_probs_dropout_prob)(
                    out, deterministic=deterministic
                )
            out = nn.Dense(
                d,
                kernel_init=trunc_normal_init(cfg.initializer_range),
                dtype=compute,
                param_dtype=cfg.policy.param,
                name="output_dense",
            )(out)
            if cfg.hidden_dropout_prob > 0.0:
                out = nn.Dropout(cfg.hidden_dropout_prob)(
                    out, deterministic=deterministic
                )
            return out, None

        qkv = jnp.einsum("...nd,dthe->t...hne", x, w_qkv.astype(compute))
        if b_qkv is not None:
            qkv = qkv + b_qkv.astype(compute).reshape(
                (3,) + (1,) * (x.ndim - 2) + (h, 1, dh)
            )
        q, k, v = qkv[0], qkv[1], qkv[2]

        if context_states is not None:
            # K/V see [hidden ++ context]; queries do not
            # (reference `modeling_base.py:77-82`).
            c = context_states.astype(compute)
            ckv = jnp.einsum("...nd,dthe->t...hne", c, w_qkv[:, 1:].astype(compute))
            if b_qkv is not None:
                ckv = ckv + b_qkv[1:].astype(compute).reshape(
                    (2,) + (1,) * (c.ndim - 2) + (h, 1, dh)
                )
            k = jnp.concatenate([k, ckv[0]], axis=-2)
            v = jnp.concatenate([v, ckv[1]], axis=-2)

        if cfg.qk_norm:
            # per-head LayerNorm over dh on queries and ALL keys (incl.
            # context keys — they enter the same score dot); learnable
            # scale, no bias (ViT-22B recipe).  Bounds |scores| ≈
            # O(√dh·|γ_q||γ_k|) at any weight scale.
            q = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, use_bias=False, dtype=compute,
                param_dtype=cfg.policy.param, name="q_norm",
            )(q)
            k = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, use_bias=False, dtype=compute,
                param_dtype=cfg.policy.param, name="k_norm",
            )(k)

        out, probs = multi_head_attention(
            q,
            k,
            v,
            mask=attention_mask,
            implementation=cfg.attn_implementation,
            output_probs=output_attentions,
        )
        if cfg.attention_probs_dropout_prob > 0.0 and not deterministic:
            # note: reference drops probs *before* the V matmul
            # (`modeling_base.py:96-102`); with fused kernels we instead
            # drop on the output, the standard fused-attention tradeoff.
            out = nn.Dropout(cfg.attention_probs_dropout_prob)(
                out, deterministic=deterministic
            )

        # [..., H, N, Dh] -> [..., N, H*Dh]
        out = jnp.swapaxes(out, -3, -2).reshape(hidden_states.shape[:-1] + (h * dh,))

        out = nn.Dense(
            d,
            kernel_init=trunc_normal_init(cfg.initializer_range),
            dtype=compute,
            param_dtype=cfg.policy.param,
            name="output_dense",
        )(out)
        if cfg.hidden_dropout_prob > 0.0:
            out = nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)
        return out, probs


class BaseMLP(nn.Module):
    """GELU MLP, hidden = hidden_size * mlp_ratio
    (reference `modeling_base.py:253-269`)."""

    config: BaseViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        compute = cfg.policy.compute
        x = nn.Dense(
            cfg.mlp_hidden_size,
            kernel_init=trunc_normal_init(cfg.initializer_range),
            dtype=compute,
            param_dtype=cfg.policy.param,
            name="fc1",
        )(x.astype(compute))
        if cfg.hidden_act == "gelu":
            # erf-grade GELU through the fitted tanh-form erf (erf abs
            # err ≤4.3e-5: bf16-identical to exact erf, hardware-tanh
            # speed).  XLA's erf polynomial cost 19% of the whole bf16
            # ViT-B forward (3,001 → 3,801 img/s e2e ladder,
            # benchmarks/RESULTS.md r3; ops/gelu.py)
            from msvit_tpu.ops.gelu import gelu_erf_tanh

            x = gelu_erf_tanh(x)
        elif cfg.hidden_act == "gelu_as":
            # Abramowitz–Stegun erf (abs err ≤4e-7, one hardware exp) —
            # tighter than the tanh form when f32-level exactness matters
            from msvit_tpu.ops.gelu import gelu_erf

            x = gelu_erf(x)
        elif cfg.hidden_act == "gelu_xla_erf":
            # XLA's native erf lowering — numerics oracle for the above
            x = jax.nn.gelu(x, approximate=False)
        elif cfg.hidden_act == "gelu_tanh":
            # tanh-approx GELU (the torch nn.GELU('tanh') variant —
            # a ~1e-3-error DIFFERENT function, kept for configs that
            # train with it)
            x = jax.nn.gelu(x, approximate=True)
        else:
            x = getattr(jax.nn, cfg.hidden_act)(x)
        x = nn.Dense(
            cfg.hidden_size,
            kernel_init=trunc_normal_init(cfg.initializer_range),
            dtype=compute,
            param_dtype=cfg.policy.param,
            name="fc2",
        )(x)
        return x


class BaseSwiGLUFFN(nn.Module):
    """SwiGLU FFN (reference `modeling_base.py:272-286`)."""

    config: BaseViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        compute = cfg.policy.compute
        hidden = cfg.swiglu_hidden_size
        x = nn.Dense(
            2 * hidden,
            kernel_init=trunc_normal_init(cfg.initializer_range),
            dtype=compute,
            param_dtype=cfg.policy.param,
            name="weights_in",
        )(x.astype(compute))
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = jax.nn.silu(x1) * x2
        return nn.Dense(
            cfg.hidden_size,
            kernel_init=trunc_normal_init(cfg.initializer_range),
            dtype=compute,
            param_dtype=cfg.policy.param,
            name="weights_out",
        )(x)


def _drop_path(
    x: jnp.ndarray, rate: float, deterministic: bool, rng
) -> jnp.ndarray:
    """Per-sample stochastic depth (reference `modeling_base.py:232-247`)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, dtype=jnp.float32))
    return (x / keep) * mask.astype(x.dtype)


class BaseViTLayer(nn.Module):
    """Pre-LN transformer block (reference `modeling_base.py:295-345`)."""

    config: BaseViTConfig

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        context_states: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        output_attentions: bool = False,
        banded_segments=None,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        cfg = self.config
        from msvit_tpu.models.base.norm import LayerNorm

        ln = lambda name: LayerNorm(  # noqa: E731
            epsilon=cfg.layer_norm_eps,
            out_dtype=cfg.policy.compute,
            param_dtype=cfg.policy.param,
            name=name,
        )
        ls1 = self.param(
            "layer_scale1",
            nn.initializers.constant(cfg.layerscale_value),
            (cfg.hidden_size,),
        )
        ls2 = self.param(
            "layer_scale2",
            nn.initializers.constant(cfg.layerscale_value),
            (cfg.hidden_size,),
        )

        attn_out, probs = BaseViTSelfAttention(cfg, name="attention")(
            ln("norm1")(hidden_states),
            context_states=context_states,
            attention_mask=attention_mask,
            deterministic=deterministic,
            output_attentions=output_attentions,
            banded_segments=banded_segments,
        )
        attn_out = attn_out * ls1.astype(attn_out.dtype)
        if cfg.drop_path_rate > 0.0 and not deterministic:
            attn_out = _drop_path(
                attn_out, cfg.drop_path_rate, deterministic, self.make_rng("droppath")
            )
        hidden_states = attn_out + hidden_states

        if cfg.num_experts > 0:
            from msvit_tpu.models.base.moe import MoEFFN

            mlp_out, moe_aux = MoEFFN(
                cfg, num_experts=cfg.num_experts, name="mlp"
            )(ln("norm2")(hidden_states), deterministic=deterministic)
            self.sow("intermediates", "moe_aux_loss", moe_aux)
        else:
            mlp_cls = BaseSwiGLUFFN if cfg.use_swiglu_ffn else BaseMLP
            mlp_out = mlp_cls(cfg, name="mlp")(
                ln("norm2")(hidden_states), deterministic=deterministic
            )
        mlp_out = mlp_out * ls2.astype(mlp_out.dtype)
        if cfg.drop_path_rate > 0.0 and not deterministic:
            mlp_out = _drop_path(
                mlp_out, cfg.drop_path_rate, deterministic, self.make_rng("droppath")
            )
        hidden_states = mlp_out + hidden_states

        return hidden_states, probs


class BaseViTEncoder(nn.Module):
    """Stack of blocks, with optional **per-layer** context states
    (reference `modeling_base.py:348-397`; per-layer indexing at `:371`).

    The layer loop is a Python loop (static depth) so callers like the
    multistate backbone can interleave re-clustering between layers; with
    ``config.remat`` each block is rematerialized under jax.checkpoint.
    """

    config: BaseViTConfig

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        context_states: Optional[Sequence[Optional[jnp.ndarray]]] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        output_attentions: bool = False,
        output_hidden_states: bool = False,
    ):
        cfg = self.config
        all_hidden = [] if output_hidden_states else None
        all_attn = [] if output_attentions else None

        layer_cls = BaseViTLayer
        if cfg.remat:
            policies = {
                "": None,
                "dots": jax.checkpoint_policies.checkpoint_dots,
                "dots_no_batch":
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            }
            layer_cls = nn.remat(
                BaseViTLayer,
                static_argnums=(4, 5),
                policy=policies[cfg.remat_policy],
            )

        def constrain(x):
            # sequence parallelism: tokens sharded on "model" between
            # blocks; no-op without an active mesh
            if not cfg.sequence_sharding:
                return x
            from jax.sharding import PartitionSpec as P

            try:
                return jax.lax.with_sharding_constraint(
                    x, P("data", "model", None)
                )
            except (ValueError, RuntimeError):
                return x

        if cfg.scan_layers:
            # one scanned layer body: compile time/HLO size stop scaling
            # with depth.  Uniform trunk only — the features that need a
            # per-layer Python loop are rejected here, not silently wrong.
            if context_states is not None:
                raise ValueError("scan_layers: per-layer context_states "
                                 "need the unrolled trunk")
            if output_attentions or output_hidden_states:
                raise ValueError("scan_layers: per-layer output collection "
                                 "needs the unrolled trunk")
            if cfg.num_experts > 0:
                raise ValueError("scan_layers: MoE sows per-layer aux loss; "
                                 "use the unrolled trunk")
            scan_cls = nn.scan(
                layer_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True, "droppath": True},
                length=cfg.num_hidden_layers,
                in_axes=(nn.broadcast,) * 4,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )
            hidden_states = constrain(hidden_states)
            hidden_states, _ = scan_cls(cfg, name="layers")(
                hidden_states,
                None,
                attention_mask,
                deterministic,
                False,
            )
            return hidden_states, None, None

        for i in range(cfg.num_hidden_layers):
            hidden_states = constrain(hidden_states)
            if output_hidden_states:
                all_hidden.append(hidden_states)
            ctx = context_states[i] if context_states is not None else None
            hidden_states, probs = layer_cls(cfg, name=f"layer_{i}")(
                hidden_states,
                ctx,
                attention_mask,
                deterministic,
                output_attentions,
            )
            if output_attentions:
                all_attn.append(probs)

        if output_hidden_states:
            all_hidden.append(hidden_states)
        return hidden_states, all_hidden, all_attn
