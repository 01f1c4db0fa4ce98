"""Multi-state encoder (flax.linen).

Behavioral counterpart of `model/multistate_encoder/modeling_msvitencoder.py`
redesigned for static shapes:

* the reference's dynamically-sized cluster axis (`max_n_clusters =
  cluster_indices.max()+1`, `:428-429`) becomes a **padded static axis**
  of `config.max_clusters` slots with a validity count — the mask and
  TX/RX token tensors keep one shape across the whole network;
* the structured attention mask (`_construct_attention_mask_indices`,
  `:427-452`) is rebuilt from broadcast compares on segment ids — no index
  scattering: (a) intra-cluster token↔token, (b) TXc → tokens of c,
  (c) tokens → their RX, (d) every valid RX → every valid TX;
* masking is **soft**: scores − attention_mask_inf·(1−mask) (`:146`),
  i.e. an additive −1e2 penalty, not −inf.  Padded (invalid) TX/RX
  columns therefore leak only e^{−1e2}-scale probability — negligible,
  and documented as the one deviation from the reference's
  dynamically-absent slots;
* TX/RX duplication on re-clustering is the reference's cumsum +
  searchsorted parent mapping (`:494-502`) as a static gather;
* layers are the shared pre-LN trunk blocks (the reference builds its
  layer from HF ViT internals, `:251-337` — same math as BaseViTLayer
  with identity layer scale).

Clustering runs under `stop_gradient` (the reference never trains through
it; its sandbox is inference-only, `sandbox/test.py`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from msvit_tpu.models.base.model import BaseViTLayer, trunc_normal_init
from msvit_tpu.models.base.vit import ViTEmbeddings
from msvit_tpu.models.clustering import cluster, max_children_bound
from msvit_tpu.models.multistate.config import MultiStateViTConfig


def build_multistate_attention_mask(
    cluster_indices: jnp.ndarray,  # [B, N] int32
    n_clusters: jnp.ndarray,  # [] or [B] int32 — number of valid clusters
    max_clusters: int,
) -> jnp.ndarray:
    """Bool mask [B, 1, 2C+N, 2C+N] with the reference's four blocks
    (`modeling_msvitencoder.py:432-451`).  Layout: TX_c at 2c, RX_c at
    2c+1, then the N patch tokens."""
    b, n = cluster_indices.shape
    c = max_clusters
    n_clusters = jnp.broadcast_to(jnp.asarray(n_clusters), (b,))
    cvalid = jnp.arange(c)[None] < n_clusters[:, None]  # [B, C]

    ci = cluster_indices
    intra = ci[:, :, None] == ci[:, None, :]  # [B, N, N]
    tok_in_c = ci[:, None, :] == jnp.arange(c)[None, :, None]  # [B, C, N]

    mask = jnp.zeros((b, 2 * c + n, 2 * c + n), bool)
    # (a) intra-cluster token↔token
    mask = mask.at[:, 2 * c :, 2 * c :].set(intra)
    # (b) TX_c → its cluster's tokens (rows 2c)
    mask = mask.at[:, 0 : 2 * c : 2, 2 * c :].set(tok_in_c)
    # (c) cluster tokens → their RX (columns 2c+1)
    mask = mask.at[:, 2 * c :, 1 : 2 * c : 2].set(
        jnp.swapaxes(tok_in_c, 1, 2)
    )
    # (d) all valid RX → all valid TX
    rx_tx = cvalid[:, :, None] & cvalid[:, None, :]  # [B, C, C]
    mask = mask.at[:, 1 : 2 * c : 2, 0 : 2 * c : 2].set(rx_tx)
    return mask[:, None]


class MultiStateViTEncoderBackbone(nn.Module):
    """Core loop (reference `modeling_msvitencoder.py:412-552`)."""

    config: MultiStateViTConfig

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # [B, N, D]
        rng: Optional[jax.Array] = None,
        deterministic: bool = True,
        output_hidden_states: bool = False,
        output_cluster_indices: bool = False,
        output_cluster_tokens: bool = False,
        output_attentions: bool = False,
    ) -> Dict[str, Any]:
        cfg = self.config
        b, n, d = hidden_states.shape
        c = cfg.max_clusters
        if rng is None:
            rng = self.make_rng("clustering")

        tx = self.param(
            "transmitter_token", trunc_normal_init(cfg.initializer_range), (d,)
        )
        rx = self.param(
            "receiver_token", trunc_normal_init(cfg.initializer_range), (d,)
        )
        cluster_tokens = jnp.broadcast_to(
            jnp.stack([tx, rx])[None, None], (b, c, 2, d)
        ).astype(hidden_states.dtype)

        cluster_indices = jnp.zeros((b, n), jnp.int32)
        n_clusters = jnp.asarray(1, jnp.int32)

        # Cluster-banded mode (config.banded_attention): tokens are kept
        # sorted by cluster id so attention can skip dead key blocks
        # (ops/banded_attention.py).  `order` maps sorted position →
        # original token index; outputs are unsorted through `inv_order`
        # before leaving the backbone.  Per-layer attention probabilities
        # need the dense path, so the flag is ignored under
        # output_attentions, and the last layer stays dense only in its
        # prefix semantics (the banded op computes prefix rows densely) —
        # here it runs fully dense because it must emit RX→TX probs.
        banded = cfg.banded_attention and not output_attentions
        mask = (
            None
            if banded
            else build_multistate_attention_mask(cluster_indices, n_clusters, c)
        )
        order = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[None], (b, n)
        )
        inv_order = order

        def unsort(arr, inv):
            if not banded:
                return arr
            idx = inv.reshape(inv.shape + (1,) * (arr.ndim - 2))
            return jnp.take_along_axis(arr, idx, axis=1)

        collect: Dict[str, list] = {
            "hidden_states": [hidden_states],
            "cluster_indices": [cluster_indices],
            "cluster_tokens": [cluster_tokens],
            "intracluster_attentions": [],
            "transmitter_to_cluster_attentions": [],
            "cluster_to_receiver_attentions": [],
            "receiver_to_transmitter_attentions": [],
        }

        rx_to_tx = None
        # static bound on distinct parent ids at each clustering call:
        # 1 at the first (all tokens in cluster 0), then ≤ bound(prev)
        # children — lets the clustering module shrink its padded
        # per-parent axis without any semantics change
        parents_bound = 1
        for i in range(cfg.num_hidden_layers):
            if (
                i >= cfg.pregeneration_period
                and i % cfg.generation_period == 0
            ):
                rng, step_key = jax.random.split(rng)
                # clustering must see tokens in ORIGINAL order: its anchor
                # draws are positional, so feeding the sorted layout would
                # change which tokens become anchors — banded and dense
                # modes would cluster differently with the same rng
                h_orig = unsort(hidden_states, inv_order)
                child_indices, n_children = cluster(
                    cfg.clustering,
                    unsort(cluster_indices, inv_order),
                    jax.lax.stop_gradient(h_orig.astype(jnp.float32)),
                    step_key,
                    max_parents=parents_bound,
                )
                parents_bound = max_children_bound(
                    cfg.clustering, parents_bound
                )
                # duplicate parent TX/RX pairs onto their children via
                # cumsum + searchsorted (reference `:494-502`).  n_children
                # is [C] in pooled mode (global ids, shared parent map) or
                # [B, C] in per-image mode (config.clustering.pool_batch).
                cum = jnp.cumsum(n_children, axis=-1)
                if n_children.ndim == 1:
                    parent_of = jnp.searchsorted(
                        cum, jnp.arange(c), side="right"
                    ).astype(jnp.int32)
                    parent_of = jnp.clip(parent_of, 0, c - 1)
                    cluster_tokens = cluster_tokens[:, parent_of]
                    n_clusters = jnp.maximum(cum[-1].astype(jnp.int32), 1)
                else:
                    parent_of = jax.vmap(
                        lambda cm: jnp.searchsorted(
                            cm, jnp.arange(c), side="right"
                        )
                    )(cum).astype(jnp.int32)
                    parent_of = jnp.clip(parent_of, 0, c - 1)
                    cluster_tokens = jnp.take_along_axis(
                        cluster_tokens, parent_of[:, :, None, None], axis=1
                    )
                    n_clusters = jnp.maximum(cum[:, -1].astype(jnp.int32), 1)
                if banded:
                    # child_indices are in original token order; re-sort
                    # everything by the new ids (no perm composition —
                    # `order` is always argsort of the original-order ids)
                    order = jnp.argsort(child_indices, axis=1)
                    inv_order = jnp.argsort(order, axis=1)
                    hidden_states = jnp.take_along_axis(
                        h_orig, order[..., None], axis=1
                    )
                    cluster_indices = jnp.take_along_axis(
                        child_indices, order, axis=1
                    )
                else:
                    cluster_indices = child_indices
                    mask = build_multistate_attention_mask(
                        cluster_indices, n_clusters, c
                    )

            concat = jnp.concatenate(
                [cluster_tokens.reshape(b, 2 * c, d), hidden_states], axis=1
            )
            # probabilities are only a model output on the last layer (the
            # pooled RX→TX attentions) or when per-layer attentions are
            # requested; other layers can use the fused prob-free kernel
            need_probs = output_attentions or i == cfg.num_hidden_layers - 1
            if banded and not need_probs:
                from msvit_tpu.ops.banded_attention import BandedSegments

                concat, probs = BaseViTLayer(cfg, name=f"layer_{i}")(
                    concat,
                    deterministic=deterministic,
                    banded_segments=BandedSegments(
                        cid=cluster_indices,
                        n_clusters=n_clusters,
                        max_clusters=c,
                        mask_inf=cfg.attention_mask_inf,
                    ),
                )
            else:
                if banded:  # last layer: dense, mask over sorted tokens
                    mask = build_multistate_attention_mask(
                        cluster_indices, n_clusters, c
                    )
                # soft mask (reference `:146`): scores − inf·(1−mask)
                additive = jnp.where(
                    mask, 0.0, -cfg.attention_mask_inf
                ).astype(jnp.float32)
                concat, probs = BaseViTLayer(cfg, name=f"layer_{i}")(
                    concat,
                    attention_mask=additive,
                    deterministic=deterministic,
                    output_attentions=need_probs,
                )
            cluster_tokens = concat[:, : 2 * c].reshape(b, c, 2, d)
            hidden_states = concat[:, 2 * c :]

            # attention sub-blocks (reference `:534-538`) — static slices
            # thanks to the even/odd TX/RX layout
            if need_probs:
                rx_to_tx = probs[:, :, 1 : 2 * c : 2, 0 : 2 * c : 2]
            if output_hidden_states:
                collect["hidden_states"].append(
                    unsort(hidden_states, inv_order)
                )
            if output_cluster_indices:
                collect["cluster_indices"].append(
                    unsort(cluster_indices, inv_order)
                )
            if output_cluster_tokens:
                collect["cluster_tokens"].append(cluster_tokens)
            if output_attentions:
                collect["intracluster_attentions"].append(
                    probs[:, :, 2 * c :, 2 * c :]
                )
                collect["transmitter_to_cluster_attentions"].append(
                    probs[:, :, 0 : 2 * c : 2, 2 * c :]
                )
                collect["cluster_to_receiver_attentions"].append(
                    probs[:, :, 2 * c :, 1 : 2 * c : 2]
                )
                collect["receiver_to_transmitter_attentions"].append(rx_to_tx)

        return {
            "last_hidden_state": unsort(hidden_states, inv_order),
            "last_cluster_tokens": cluster_tokens,
            "last_cluster_indices": unsort(cluster_indices, inv_order),
            "num_clusters": n_clusters,
            "last_receiver_to_transmitter_attentions": rx_to_tx,
            **{k: (v if v else None) for k, v in collect.items()},
        }


class MultiStateViTEncoderModel(nn.Module):
    """Embeddings (CLS dropped, reference `:107-117`) → backbone → pooler
    (TX tokens + RX→TX attentions, reference `:555-561,670-745`)."""

    config: MultiStateViTConfig
    add_pooling_layer: bool = True

    @nn.compact
    def __call__(
        self,
        pixel_values: jnp.ndarray,  # [B, H, W, C] NHWC
        rng: Optional[jax.Array] = None,
        deterministic: bool = True,
        interpolate_pos_encoding: bool = False,
        **output_kwargs: bool,
    ) -> Dict[str, Any]:
        cfg = self.config
        emb = ViTEmbeddings(cfg, add_cls_token=False, name="embeddings")(
            pixel_values,
            deterministic=deterministic,
            interpolate_pos_encoding=interpolate_pos_encoding,
        )
        out = MultiStateViTEncoderBackbone(cfg, name="backbone")(
            emb, rng=rng, deterministic=deterministic, **output_kwargs
        )
        if self.add_pooling_layer:
            out["cluster_tokens"] = out["last_cluster_tokens"][:, :, 0, :]
            out["receiver_to_transmitter_attentions"] = out[
                "last_receiver_to_transmitter_attentions"
            ]
        return out


def compress_tokens_with_cluster_indices(
    query_layer: jnp.ndarray,  # [B, H, N, Dh]
    key_weight: jnp.ndarray,  # [D, H, Dh] (our fused-QKV K slice)
    key_bias: jnp.ndarray,  # [H, Dh]
    attention_probs: jnp.ndarray,  # [B, H, N, N]
    cluster_indices: jnp.ndarray,  # [B, N]
    n_clusters: int,
    head_dim: int,
) -> jnp.ndarray:
    """Least-squares "transmitter token" compression — a working version
    of the reference's experimental dead code
    (`modeling_msvitencoder.py:163-215`, which ends in `raise Exception()`):
    solve for C tokens t_c (plus per-(head, query) bias absorbers) whose
    key projections reproduce the cluster-summed attention logits.
    Returns transmitter_tokens [B, C, D]."""
    from msvit_tpu.utils.math import multiclass_logits

    b, h, n, dh = query_layer.shape
    d = key_weight.shape[0]
    c = n_clusters

    masks = cluster_indices[..., None] == jnp.arange(c)  # [B, N, C]
    tx_probs = jnp.einsum("bhqk,bkc->bhqc", attention_probs, masks.astype(attention_probs.dtype))
    s = multiclass_logits(tx_probs) * (head_dim**0.5)  # [B, H, N, C]

    # Q·(W_k t + b_k) ≈ s  →  unknowns: t_c [C, D] and a bias per (h, q)
    qmk = jnp.einsum("bhqe,dhe->bhqd", query_layer, key_weight)  # [B,H,N,D]
    qmb = jnp.einsum("bhqe,he->bhq", query_layer, key_bias)  # [B,H,N]
    s = s - qmb[..., None]  # [B,H,N,C]

    # design matrix rows indexed by (h, q, c): block-diagonal in c for the
    # token unknowns, identity in (h, q) for the bias unknowns
    eye_c = jnp.eye(c)
    xh = jnp.einsum("bhqd,ce->bhqced", qmk, eye_c).reshape(b, h * n * c, c * d)
    xc = jnp.repeat(jnp.eye(h * n), c, axis=0)[None].repeat(b, axis=0)
    x = jnp.concatenate([xh, xc], axis=-1)  # [B, HNC, CD+HN]
    y = s.reshape(b, h * n * c, 1)

    solve = jax.vmap(lambda xb, yb: jnp.linalg.lstsq(xb, yb)[0])
    w = solve(x, y)  # [B, CD+HN, 1]
    return w[:, : c * d, 0].reshape(b, c, d)


class MultiStateViTForImageClassification(nn.Module):
    """Classification head over the pooled transmitter tokens.

    The reference stops at the pooler (TX tokens + RX→TX attentions,
    `modeling_msvitencoder.py:555-561`) and never adds a task head; this
    is the natural fine-tuning story for the family: occupancy-weighted
    mean of the TX tokens → linear head.  Intended use mirrors the
    reference's policy-only subsample training (`sandbox/subsample_vit.py
    :83-124`): freeze the pretrained trunk, train the TX/RX tokens and
    the classifier (see examples/train_multistate.py)."""

    config: MultiStateViTConfig
    num_labels: int = 1000

    @nn.compact
    def __call__(
        self,
        pixel_values: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        deterministic: bool = True,
        interpolate_pos_encoding: bool = False,
    ) -> Dict[str, Any]:
        cfg = self.config
        out = MultiStateViTEncoderModel(cfg, name="encoder")(
            pixel_values,
            rng=rng,
            deterministic=deterministic,
            interpolate_pos_encoding=interpolate_pos_encoding,
        )
        tx = out["cluster_tokens"].astype(jnp.float32)  # [B, C, D]
        c_max = tx.shape[1]
        # occupancy-weighted pool: only clusters that own tokens count
        occ = (
            jnp.sum(
                jax.nn.one_hot(out["last_cluster_indices"], c_max), axis=1
            )
            > 0
        ).astype(jnp.float32)  # [B, C]
        pooled = jnp.sum(tx * occ[..., None], axis=1) / jnp.maximum(
            jnp.sum(occ, axis=1, keepdims=True), 1.0
        )
        logits = nn.Dense(
            self.num_labels,
            kernel_init=trunc_normal_init(cfg.initializer_range),
            dtype=jnp.float32,
            param_dtype=cfg.policy.param,
            name="classifier",
        )(pooled)
        loss = None
        if labels is not None:
            loss = jnp.mean(
                -jnp.take_along_axis(
                    jax.nn.log_softmax(logits, axis=-1),
                    labels[:, None],
                    axis=1,
                )[:, 0]
            )
        out.update({"logits": logits, "loss": loss})
        return out
