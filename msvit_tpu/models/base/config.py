"""Config for the base ViT trunk.

Mirrors the fields of the reference's `BaseViTConfig`
(`model/base_encoder/configuration_base.py:30-222`) as a frozen, hashable
dataclass (no HF PretrainedConfig kwarg zoo, no mutable state).  Extra
TPU-specific fields: mixed-precision `policy`, `attn_implementation`
("xla" | "flash" | "auto"), and `remat` for jax.checkpoint over blocks.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from msvit_tpu.settings import Policy


@dataclasses.dataclass(frozen=True)
class BaseViTConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    mlp_ratio: float = 4.0
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.0
    attention_probs_dropout_prob: float = 0.0
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-6
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    qkv_bias: bool = True
    # per-head LayerNorm on q and k before the score dot (ViT-22B-style
    # qk-norm): bounds attention logits, the from-scratch stabilizer for
    # deep trunks (the r4 12-layer synthetic runs spike without it).
    # New capability vs the reference (it only ever fine-tunes
    # pretrained trunks).  Forces the einsum attention path (the packed
    # fast path consumes the raw QKV GEMM output).
    qk_norm: bool = False
    layerscale_value: float = 1.0
    drop_path_rate: float = 0.0
    use_swiglu_ffn: bool = False
    # > 0 replaces the dense FFN with a top-1 mixture-of-experts
    # (models/base/moe.py); experts shard over the "model" mesh axis (ep)
    num_experts: int = 0
    # "dispatch": capacity-bounded token dispatch (Switch-style; tokens
    # over capacity are dropped to the residual).  "dense": all experts
    # computed for every token and masked (small-scale testbed/oracle).
    moe_impl: str = "dispatch"
    # expert queue capacity = ceil(capacity_factor * tokens / experts)
    moe_capacity_factor: float = 1.25

    # Pointer to a pretrained torch/HF checkpoint to import weights from
    # (reference `configuration_base.py` `pretrained`/`pretrained_cls`);
    # consumed by msvit_tpu.compat.hf_import, never downloaded implicitly.
    pretrained: Optional[str] = None

    # --- TPU-specific ---
    attn_implementation: str = "auto"
    policy: Policy = Policy()
    remat: bool = False  # jax.checkpoint each block (memory ↔ FLOPs)
    # checkpoint policy under remat: "" = save nothing (full recompute);
    # "dots" = save MXU outputs, recompute elementwise only
    # (jax.checkpoint_policies.checkpoint_dots) — ~5% step cost instead
    # of ~15-30%; "dots_no_batch" = dots_with_no_batch_dims_saveable
    remat_policy: str = ""
    # Trunk as ONE nn.scan'd layer instead of L unrolled blocks: the HLO
    # contains a single layer body, so compile time and program size stop
    # scaling with depth (measured: ViT-B train graph 7 s vs 21 s
    # unrolled).  The tradeoff is real and measured: the while-loop
    # serializes per-layer, defeating XLA's cross-layer software
    # pipelining — steady-state train steps run 1.4-1.6x slower on v5e
    # (RESULTS.md "Scanned trunk").  Use for dev iteration, very deep
    # stacks, or memory-limited compiles; keep off (default) for
    # production throughput.  Combine with remat=True for training (the
    # scan otherwise stacks every layer's residuals).  Params live
    # stacked under "layers"; convert to/from the unrolled "layer_{i}"
    # layout (the HF-import format) with models/base/scan.py::
    # {stack_layer_params, unstack_layer_params}.  Uniform-trunk only:
    # no per-layer context states, MoE sow, or per-layer output
    # collection.
    scan_layers: bool = False
    # Megatron-SP-style sequence parallelism: constrain the token axis of
    # inter-block activations to the "model" mesh axis (GSPMD inserts the
    # all-gather/reduce-scatter pairs around attention/MLP).  Requires
    # running under a ("data","model") mesh context (jax.sharding.use_mesh).
    sequence_sharding: bool = False

    # Explicit per-head size.  None = hidden_size // num_attention_heads;
    # set by head pruning (models/base/pruning.py), where the remaining
    # head count no longer divides hidden_size (HF keeps the same value
    # as a module attribute after `prune_heads`).
    attention_head_size: Optional[int] = None

    @property
    def head_dim(self) -> int:
        if self.attention_head_size is not None:
            return self.attention_head_size
        if self.hidden_size % self.num_attention_heads:
            raise ValueError(
                f"hidden_size {self.hidden_size} not divisible by "
                f"num_attention_heads {self.num_attention_heads}"
            )
        return self.hidden_size // self.num_attention_heads

    @property
    def mlp_hidden_size(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)

    @property
    def swiglu_hidden_size(self) -> int:
        # 2/3 ratio rounded up to a multiple of 8
        # (reference `modeling_base.py:276-277`)
        h = int(self.mlp_hidden_size * 2 / 3)
        return (h + 7) // 8 * 8

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2
