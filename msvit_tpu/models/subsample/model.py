"""Subsample encoder: coarse-to-fine quadtree token refinement.

Behavioral counterpart of the reference's `SubsampleViTModel`
(`model/subsample_encoder/modeling_ssvit.py:292-537`) redesigned for XLA:

The reference grows a TensorDict token axis dynamically
(`modeling_ssvit.py:505-520` — "dynamic shapes!" per SURVEY §3.3) and
compacts live tokens with data-dependent topk (`mask_to_indices`,
`:405-412`).  On TPU both are replaced by one observation: **the quadtree
geometry is static** — every box a token could ever occupy is determined
by its tree position alone (the initial config is always the full image,
`modeling_ssvit.py:361-364`, and children boxes are a deterministic
subdivision of the parent, `:86-103`).  So we:

* preallocate a full g-ary tree of ``capacity`` slots with per-slot
  corners/depth/parent tables computed in numpy at trace time;
* embed **all** slots once, in a single fused grid-sample + matmul batch
  (better MXU utilization than the reference's per-depth incremental
  embeds; worst-case FLOPs are identical);
* run the refinement loop over static shapes: validity/lock masks select
  live tokens, children slots are *activated* (not appended) when the
  REINFORCE policy samples a split.

Modes (reference `configuration_ssvit.py`): "open" re-encodes everything
every iteration; "lock" freezes declining tokens out of decisions;
"freeze" additionally feeds locked tokens' cached per-layer hidden states
back as attention **context** instead of re-encoding them — a KV cache
(`modeling_ssvit.py:432-459` feeding the K/V concat at
`modeling_base.py:77-82`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from msvit_tpu.models.base.model import BaseViTEncoder, trunc_normal_init
from msvit_tpu.models.subsample.config import SubsampleViTConfig
from msvit_tpu.ops.grid_sample import grid_sample

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class QuadTree:
    """Static full-tree tables (numpy, trace-time constants).

    corners[s] = ((c00, c01), (c10, c11)) in the reference's coordinate
    convention (`modeling_ssvit.py:88`: axis 0 of the last dim is the
    coordinate that torch `grid_sample` receives *after* the flip at
    `:149`, i.e. (y, x) image order).
    """

    corners: np.ndarray  # [C, 2, 2] float32
    depth: np.ndarray  # [C] int32
    parent: np.ndarray  # [C] int32 (-1 for roots)
    child_start: np.ndarray  # [C] int32 (-1 for leaves)
    level_offsets: Tuple[int, ...]


def subdivide_boxes(corners: np.ndarray, grid: int) -> np.ndarray:
    """Split boxes [..., 2, 2] into grid² children [..., grid², 2, 2]
    (the math of reference `grid_sample_points`, `modeling_ssvit.py:86-99`)."""
    l = np.linspace(1.0, 0.0, grid + 1, dtype=np.float32)
    a = np.stack(np.meshgrid(l[:-1], l[:-1], indexing="ij"), axis=-1)  # [G,G,2]
    b = np.stack(np.meshgrid(l[1:], l[1:], indexing="ij"), axis=-1)
    gg = np.stack([a, b], axis=-2).reshape(grid * grid, 2, 2)  # [G²,2(new),2(xy)]
    grid_points = np.stack([gg, 1.0 - gg], axis=-2)  # [G²,2(new),2(old),2(xy)]
    return np.sum(
        corners[..., None, None, :, :] * grid_points, axis=-2
    )  # [..., G², 2(new), 2(xy)]


def build_quadtree(config: SubsampleViTConfig) -> QuadTree:
    g_children = config.children_per_split
    root = np.asarray([[-1.0, -1.0], [1.0, 1.0]], np.float32)

    corners = [subdivide_boxes(root, config.initial_grid_size)]  # level 0
    for _ in range(config.max_depth):
        prev = corners[-1]  # [n, 2, 2]
        kids = subdivide_boxes(prev, config.multiplicative_grid_size)
        corners.append(kids.reshape(-1, 2, 2))

    level_sizes = [c.shape[0] for c in corners]
    level_offsets = np.concatenate([[0], np.cumsum(level_sizes)])
    cap = int(level_offsets[-1])

    depth = np.concatenate(
        [np.full(n, k, np.int32) for k, n in enumerate(level_sizes)]
    )
    parent = np.full(cap, -1, np.int32)
    child_start = np.full(cap, -1, np.int32)
    for k in range(config.max_depth):
        off, n = int(level_offsets[k]), level_sizes[k]
        coff = int(level_offsets[k + 1])
        for j in range(n):
            s = off + j
            child_start[s] = coff + j * g_children
            parent[coff + j * g_children : coff + (j + 1) * g_children] = s

    return QuadTree(
        corners=np.concatenate(corners, axis=0).astype(np.float32),
        depth=depth,
        parent=parent,
        child_start=child_start,
        level_offsets=tuple(int(o) for o in level_offsets),
    )


class SubsampleViTEmbeddings(nn.Module):
    """Embed every quadtree slot: bicubic-resample each box to P×P,
    project (one matmul ≡ the reference's stride-P conv,
    `modeling_ssvit.py:183`), and add a position embedding sampled
    bicubically from the pretrained position table at the box center
    (`modeling_ssvit.py:105-131`)."""

    config: SubsampleViTConfig

    @nn.compact
    def __call__(
        self,
        pixel_values: jnp.ndarray,  # [B, H, W, C] NHWC
        corners: jnp.ndarray,  # [S, 2, 2] static slot boxes ((y,x) order)
        deterministic: bool = True,
        return_pixel_values: bool = False,
    ):
        cfg = self.config
        p = cfg.patch_size
        b = pixel_values.shape[0]
        s = corners.shape[0]

        # P×P sample lattice per box (reference patch_points + affine,
        # `modeling_ssvit.py:80-84,100-103`) — boxes are axis-aligned, so
        # sampling runs through the separable matmul sampler
        from msvit_tpu.ops.grid_sample import grid_sample_separable

        c = 1.0 / p
        lin = jnp.linspace(-1.0 + c, 1.0 - c, p)
        center = (corners[:, 0] + corners[:, 1]) / 2.0  # [S,2]
        half = (corners[:, 1] - corners[:, 0]) / 2.0  # [S,2]
        ys = center[:, 0:1] + lin[None] * half[:, 0:1]  # [S,P]
        xs = center[:, 1:2] + lin[None] * half[:, 1:2]
        patches = grid_sample_separable(
            pixel_values,
            jnp.broadcast_to(ys[None], (b, s, p)),
            jnp.broadcast_to(xs[None], (b, s, p)),
            mode="bicubic",
            padding_mode="zeros",
        )  # [B,S,P,P,C]

        x = patches.reshape(b, s, p * p * pixel_values.shape[-1])
        x = nn.Dense(
            cfg.hidden_size,
            kernel_init=trunc_normal_init(cfg.initializer_range),
            dtype=cfg.policy.compute,
            param_dtype=cfg.policy.param,
            name="patch_projection",
        )(x.astype(cfg.policy.compute))

        # position table sampled at box centers (bicubic, zeros padding)
        pos_table = self.param(
            "position_embeddings",
            trunc_normal_init(cfg.initializer_range),
            (1, cfg.num_patches + 1, cfg.hidden_size),
        )
        k = int(round(cfg.num_patches**0.5))
        table = pos_table[0, 1:].reshape(1, k, k, cfg.hidden_size)
        pos = grid_sample(
            table,
            jnp.flip(center, axis=-1)[None],  # (y,x) -> (x,y)
            mode="bicubic",
            padding_mode="zeros",
        )  # [1,S,D]
        x = x + pos.astype(x.dtype)
        if cfg.hidden_dropout_prob > 0.0:
            x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        return x, (patches if return_pixel_values else None)


class SubsampleViTModel(nn.Module):
    """Coarse-to-fine loop (reference `modeling_ssvit.py:325-537`)."""

    config: SubsampleViTConfig

    @nn.compact
    def __call__(
        self,
        pixel_values: jnp.ndarray,  # [B, H, W, C]
        rng: Optional[jax.Array] = None,
        deterministic: bool = True,
        output_logs: bool = False,
        return_pixel_values: bool = False,
    ) -> Dict[str, Any]:
        cfg = self.config
        tree = build_quadtree(cfg)
        b = pixel_values.shape[0]
        cap = cfg.capacity
        n_layers = cfg.num_hidden_layers
        d = cfg.hidden_size
        compute = cfg.policy.compute
        if rng is None:
            rng = self.make_rng("policy")

        cls_token = self.param(
            "cls_token", trunc_normal_init(cfg.initializer_range), (1, 1, d)
        )

        corners = jnp.asarray(tree.corners)  # [cap,2,2]
        depth = jnp.asarray(tree.depth)  # [cap]
        parent = jnp.asarray(tree.parent)

        # one fused embed of the whole tree (see module docstring)
        input_state, patch_pixels = SubsampleViTEmbeddings(cfg, name="embeddings")(
            pixel_values,
            corners,
            deterministic=deterministic,
            return_pixel_values=return_pixel_values,
        )  # [B,cap,D]

        encoder = BaseViTEncoder(cfg, name="encoder")
        policy = nn.Dense(
            1,
            kernel_init=trunc_normal_init(cfg.initializer_range),
            dtype=jnp.float32,
            param_dtype=cfg.policy.param,
            name="projection",
        )

        g = cfg.children_per_split
        log_g = math.log(g)
        weighted = cfg.use_weighted_tokens

        valid = jnp.zeros((b, cap), bool).at[:, : cfg.num_roots].set(True)
        lock = jnp.zeros((b, cap), bool)
        cached = jnp.zeros((b, cap, n_layers + 1, d), compute)
        cls_cached = jnp.zeros((b, 1, n_layers + 1, d), compute)
        cum_log_prob = jnp.zeros((b,), jnp.float32)
        convergence = valid
        logs = {
            "valid_masks": [],
            "corners": [],
            "depths": [],
            "subsample_logits": [],
            "subsample_masks": [],
        }

        cls_b = jnp.broadcast_to(cls_token, (b, 1, d)).astype(compute)

        bias_vec = (
            (-log_g) * depth.astype(jnp.float32)
            if weighted
            else jnp.zeros((cap,), jnp.float32)
        )

        for it in range(cfg.max_depth + 1):
            if cfg.nesting_mode in ("open", "lock"):
                # encode [CLS ++ all slots] under a validity mask
                # (reference `modeling_ssvit.py:414-427`)
                amask = jnp.where(valid, 0.0, NEG_INF) + bias_vec[None]
                amask = jnp.concatenate(
                    [jnp.zeros((b, 1)), amask], axis=-1
                )  # [B, 1+cap]
                hidden = jnp.concatenate([cls_b, input_state], axis=1)
                ctx = None
            elif cfg.nesting_mode == "freeze":
                # Locked tokens enter only as per-layer cached context
                # (reference `modeling_ssvit.py:432-459`).  Unlike the
                # reference's data-dependent topk compaction (`:405-412`),
                # the live/context split is STATIC here: at iteration `it`
                # the only slots that can be live (valid & unlocked) are
                # the depth-`it` level — children are activated exactly one
                # level per iteration, and every previously-live slot was
                # either locked (~split) or invalidated (split).  So
                # queries are the level-`it` slice and context is the
                # prefix of shallower levels — a fraction of the
                # full-capacity columns the round-1 version used (which
                # made freeze *slower* than recompute).
                lo = tree.level_offsets[it]
                hi = tree.level_offsets[it + 1]
                live_valid = valid[:, lo:hi] & ~lock[:, lo:hi]
                cols = [
                    jnp.zeros((b, 1)),
                    jnp.where(live_valid, 0.0, NEG_INF) + bias_vec[lo:hi][None],
                ]
                if lo > 0:
                    ctx_valid = valid[:, :lo] & lock[:, :lo]
                    cols.append(
                        jnp.where(ctx_valid, 0.0, NEG_INF) + bias_vec[:lo][None]
                    )
                    ctx = [cached[:, :lo, layer, :] for layer in range(n_layers)]
                else:
                    ctx = None
                amask = jnp.concatenate(cols, axis=-1)  # [B, 1+(hi-lo)+lo]
                hidden = jnp.concatenate([cls_b, input_state[:, lo:hi]], axis=1)
            else:
                raise ValueError(cfg.nesting_mode)

            out, all_hidden, _ = encoder(
                hidden,
                context_states=ctx,
                attention_mask=amask[:, None, None, :].astype(jnp.float32),
                deterministic=deterministic,
                output_hidden_states=True,
            )
            stacked = jnp.stack(all_hidden, axis=-2).astype(compute)  # [B,Nq,L+1,D]
            cls_cached = stacked[:, :1]
            if cfg.nesting_mode == "freeze":
                upd = convergence[:, lo:hi, None, None]
                cached = cached.at[:, lo:hi].set(
                    jnp.where(upd, stacked[:, 1:], cached[:, lo:hi])
                )
            else:
                cached = stacked[:, 1:]

            # binary subdivision policy (reference `modeling_ssvit.py:389-395`):
            # Categorical over logits (0, w) ≡ Bernoulli(sigmoid(w))
            w = policy(cached[:, :, -1, :].astype(jnp.float32))[..., 0]  # [B,cap]
            rng, step_rng = jax.random.split(rng)
            split = jax.random.bernoulli(step_rng, jax.nn.sigmoid(w))
            log_prob = jnp.where(
                split, jax.nn.log_sigmoid(w), jax.nn.log_sigmoid(-w)
            )
            subsample_mask = split & convergence
            if cfg.nesting_mode in ("lock", "freeze"):
                lock = lock | ~split

            if output_logs:
                logs["valid_masks"].append(valid)
                logs["corners"].append(corners)
                logs["depths"].append(depth)
                logs["subsample_logits"].append(jnp.where(convergence, w, 0.0))
                logs["subsample_masks"].append(subsample_mask)

            if it < cfg.max_depth:
                cum_log_prob = cum_log_prob + jnp.sum(
                    jnp.where(convergence, log_prob, 0.0), axis=-1
                )
                # activate children slots; invalidate split parents
                # (replaces TensorDict.cat growth, `modeling_ssvit.py:505-520`)
                has_parent = parent >= 0
                parent_split = (
                    subsample_mask[:, jnp.maximum(parent, 0)] & has_parent[None]
                )
                valid = (valid & ~subsample_mask) | parent_split
                # newly activated children start unlocked with zeroed cache
                # (reference appends fresh tokens with LOCK=False / zero PHS,
                # `modeling_ssvit.py:509-514`)
                lock = lock & ~parent_split
                cached = jnp.where(
                    parent_split[:, :, None, None], 0.0, cached
                )

            convergence = valid & ~lock

        final_tokens = cached[:, :, -1, :]
        seq = jnp.concatenate([cls_cached[:, :, -1, :], final_tokens], axis=1)
        from msvit_tpu.models.base.norm import LayerNorm

        seq = LayerNorm(
            epsilon=cfg.layer_norm_eps,
            out_dtype=jnp.float32,
            param_dtype=cfg.policy.param,
            name="layernorm",
        )(seq)

        return {
            "last_hidden_state": seq,  # [B, 1+cap, D]
            "last_valid_mask": valid,
            "log_prob": cum_log_prob,
            "depths": depth,
            "pixel_values": patch_pixels,
            "logs": logs if output_logs else None,
        }


class SubsampleViTForImageClassification(nn.Module):
    """CLS ++ depth-weighted mean of patch tokens → linear head; per-sample
    (non-reduced) loss (reference `modeling_ssvit.py:555-631`)."""

    config: SubsampleViTConfig

    @nn.compact
    def __call__(
        self,
        pixel_values: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        deterministic: bool = True,
        output_logs: bool = False,
        return_pixel_values: bool = False,
    ) -> Dict[str, Any]:
        cfg = self.config
        outputs = SubsampleViTModel(cfg, name="model")(
            pixel_values,
            rng=rng,
            deterministic=deterministic,
            output_logs=output_logs,
            return_pixel_values=return_pixel_values,
        )
        seq = outputs["last_hidden_state"]
        valid = outputs["last_valid_mask"]

        cls_tok = seq[:, 0]
        patch_tokens = seq[:, 1:]
        if cfg.use_weighted_tokens:
            weights = valid * jnp.power(
                float(cfg.multiplicative_grid_size),
                -6.0 * outputs["depths"].astype(jnp.float32)[None],
            )
        else:
            weights = valid.astype(jnp.float32)
        avg = jnp.sum(weights[..., None] * patch_tokens, axis=1) / jnp.sum(
            weights, axis=-1, keepdims=True
        )

        logits = nn.Dense(
            cfg.num_labels,
            kernel_init=trunc_normal_init(cfg.initializer_range),
            dtype=jnp.float32,
            param_dtype=cfg.policy.param,
            name="classifier",
        )(jnp.concatenate([cls_tok, avg], axis=-1))

        loss = None
        if labels is not None:
            if cfg.problem_type == "regression":
                loss = jnp.mean((logits - labels) ** 2, axis=-1)
            elif cfg.problem_type == "single_label_classification":
                loss = -jnp.take_along_axis(
                    jax.nn.log_softmax(logits, axis=-1), labels[:, None], axis=1
                )[:, 0]
            elif cfg.problem_type == "multi_label_classification":
                loss = jnp.mean(
                    jnp.maximum(logits, 0)
                    - logits * labels
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))),
                    axis=-1,
                )
            else:
                raise ValueError(cfg.problem_type)

        outputs.update({"classifier_logits": logits, "loss": loss})
        return outputs


def reinforce_loss(
    per_sample_loss: jnp.ndarray,  # [B]
    log_prob: jnp.ndarray,  # [B]
    eps: float = 1e-5,
) -> jnp.ndarray:
    """REINFORCE objective from the reference training script
    (`sandbox/subsample_vit.py:83,112-113`, with the documented
    `output.probability` → `log_prob` bug fixed per SURVEY §7): the
    per-sample loss is batch-normalized (BatchNorm1d(1, affine=False) in
    training mode ≡ standardize over the batch) as a variance-reducing
    baseline, then multiplied by the episode log-probability."""
    reward = jax.lax.stop_gradient(per_sample_loss)
    normalized = (reward - jnp.mean(reward)) / jnp.sqrt(jnp.var(reward) + eps)
    return jnp.mean(normalized * log_prob)
