"""Full-model pipeline parallelism: `ViTForImageClassification` over a
"stage" mesh (GPipe schedule from `parallel/pipeline.py`).

Extends the layer-stack-only GPipe of round 2 to a complete training
story (new capability beyond the single-GPU reference — SURVEY §2.10):

* the trunk's layer stack is split into S stages whose params live on
  the "stage" mesh axis (`split_layers_into_stages`);
* embeddings, the final LayerNorm, and the classifier head are
  **replicated** and run outside the pipeline loop — on TPU they are one
  patchify matmul and one [B, D] GEMM, ≪1% of trunk FLOPs, so redundant
  per-device compute is cheaper than widening the pipeline bubble by two
  extra stages (the standard praxis/GSPMD layout);
* attention masks thread through as gpipe "extras" (each stage indexes
  the mask of the microbatch it is processing);
* `make_pipelined_loss_fn` returns a Trainer-compatible
  ``loss_fn(params, batch, rng)``, so `msvit_tpu.train.Trainer` drives
  pipelined training unchanged (tests/test_pipeline.py: pipelined
  training step ≡ sequential on the virtual 8-device CPU mesh).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msvit_tpu.models.base.config import BaseViTConfig
from msvit_tpu.models.base.model import BaseViTLayer, trunc_normal_init
from msvit_tpu.models.base.norm import LayerNorm
from msvit_tpu.models.base.vit import ViTEmbeddings, ViTForImageClassification
from msvit_tpu.parallel.pipeline import (
    gpipe,
    make_layer_stage_fn,
    split_layers_into_stages,
)


def init_pipelined_classifier(
    cfg: BaseViTConfig,
    num_labels: int,
    num_stages: int,
    rng: jax.Array,
    sample_pixels: Optional[jnp.ndarray] = None,
) -> Dict[str, Any]:
    """Initialize via the sequential model (same init distribution), then
    regroup into the pipeline layout:
    {"embeddings", "stages" (leading [S] axis), "layernorm", "classifier"}.
    """
    if sample_pixels is None:
        sample_pixels = jnp.zeros(
            (1, cfg.image_size, cfg.image_size, cfg.num_channels), jnp.float32
        )
    model = ViTForImageClassification(cfg, num_labels=num_labels)
    params = model.init(rng, sample_pixels)["params"]
    return pipeline_params_from_full(params, num_stages)


def pipeline_params_from_full(
    params: Dict[str, Any], num_stages: int
) -> Dict[str, Any]:
    """`ViTForImageClassification` params → pipeline param groups."""
    vit = params["vit"]
    return {
        "embeddings": vit["embeddings"],
        "stages": split_layers_into_stages(vit["encoder"], num_stages),
        "layernorm": vit["layernorm"],
        "classifier": params["classifier"],
    }


def shard_pipeline_params(mesh: Mesh, pp: Dict[str, Any]) -> Dict[str, Any]:
    """Place stage params along the "stage" axis, replicate the rest."""
    stage_sh = NamedSharding(mesh, P("stage"))
    repl = NamedSharding(mesh, P())
    return {
        "embeddings": jax.device_put(pp["embeddings"], repl),
        "stages": jax.tree.map(
            lambda a: jax.device_put(a, stage_sh), pp["stages"]
        ),
        "layernorm": jax.device_put(pp["layernorm"], repl),
        "classifier": jax.device_put(pp["classifier"], repl),
    }


def make_pipelined_classifier_apply(
    cfg: BaseViTConfig,
    num_labels: int,
    num_stages: int,
    num_microbatches: int,
    mesh: Mesh,
):
    """Build ``apply(pp, pixel_values, attention_mask=None) -> logits``.

    pixel_values [B, H, W, C] with B divisible by num_microbatches;
    attention_mask optionally [B, 1|H, N, N].  Differentiable end-to-end
    (grads flow back through the gpipe ppermute ring)."""
    import flax.linen as nn

    embed = ViTEmbeddings(cfg, add_cls_token=True)
    ln = LayerNorm(
        epsilon=cfg.layer_norm_eps,
        out_dtype=cfg.policy.output,
        param_dtype=cfg.policy.param,
    )
    head = nn.Dense(
        num_labels,
        kernel_init=trunc_normal_init(cfg.initializer_range),
        dtype=cfg.policy.compute,
        param_dtype=cfg.policy.param,
    )
    run = gpipe(
        make_layer_stage_fn(BaseViTLayer(cfg)),
        num_stages,
        num_microbatches,
        mesh,
    )

    def apply(pp, pixel_values, attention_mask=None):
        b = pixel_values.shape[0]
        m = num_microbatches
        if b % m:
            raise ValueError(f"batch {b} not divisible by {m} microbatches")
        x = embed.apply({"params": pp["embeddings"]}, pixel_values)
        n, d = x.shape[1], x.shape[2]
        x_mb = x.reshape(m, b // m, n, d)
        extras = None
        if attention_mask is not None:
            extras = {
                "attention_mask": attention_mask.reshape(
                    (m, b // m) + attention_mask.shape[1:]
                )
            }
        h = run(pp["stages"], x_mb, extras).reshape(b, n, d)
        h = ln.apply({"params": pp["layernorm"]}, h)
        logits = head.apply({"params": pp["classifier"]}, h[:, 0])
        return logits.astype(jnp.float32)

    return apply


def make_pipelined_loss_fn(
    cfg: BaseViTConfig,
    num_labels: int,
    num_stages: int,
    num_microbatches: int,
    mesh: Mesh,
):
    """Trainer-compatible CE loss over the pipelined classifier:
    ``loss_fn(params, batch, rng) -> (scalar, {"accuracy"})`` with
    batch = {"pixel_values": [B,H,W,C], "labels": [B]}."""
    apply = make_pipelined_classifier_apply(
        cfg, num_labels, num_stages, num_microbatches, mesh
    )

    def loss_fn(params, batch, rng):
        logits = apply(params, batch["pixel_values"])
        labels = batch["labels"]
        loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        )
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, {"accuracy": acc}

    return loss_fn
