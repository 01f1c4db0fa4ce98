"""Predictive encoder tests (SURVEY §4 (c)/(d)): glimpse geometry, masked
variable-length forward, the seven-loss library, and a jitted train step
with the sandbox/predictive.py configuration."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from msvit_tpu.models.predictive import (
    PredictiveViTConfig,
    PredictiveViTModel,
    PredictiveViTTrainingConfig,
    training_loss,
)
from msvit_tpu.models.predictive.model import geometric_lengths
from msvit_tpu.settings import parity_policy


def _cfg(**kw):
    base = dict(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=64,
        patch_size=16,  # glimpse resolution; conv stack needs P % 8 == 0
        patch_config="scaling",
        use_cls_token=False,
        patch_config_scale=((1.0, 0.0), (1.0, 0.0), (1.0, -1.0)),
        expected_context_length=2.0,
        max_context_length=4,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    base.update(kw)
    return PredictiveViTConfig(**base)


def test_geometric_lengths_distribution():
    key = jax.random.PRNGKey(0)
    ls = geometric_lengths(key, (20000,), expected=2.0, max_len=50)
    assert int(ls.min()) >= 1
    # E[clamped geometric(1/2)] ≈ 2
    assert 1.8 < float(ls.mean()) < 2.2


def test_grid_sample_points_geometry():
    """scaling config: glimpse spans exp(s)·[-1,1] around the restricted
    translation (reference `modeling_spvitencoder.py:246-263`)."""
    cfg = _cfg()
    model = PredictiveViTModel(cfg)
    pix = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0), "glimpse": jax.random.PRNGKey(1)}, pix)

    s = -0.5
    t = jnp.asarray([[0.3, -0.2]])
    pc = jnp.concatenate([t, jnp.full((1, 1), s)], axis=-1)[None]  # [1,1,3]

    grid = model.apply(
        variables,
        pc,
        False,
        method=lambda m, p, b: m.patch_embeddings.grid_sample_points(p, b),
    )  # [1,1,P,P,2]
    scale = float(jnp.exp(s))
    center = (1 - scale) * np.asarray([0.3, -0.2])
    g = np.asarray(grid[0, 0])
    np.testing.assert_allclose(g[0, 0], center - scale, atol=1e-6)
    np.testing.assert_allclose(g[-1, -1], center + scale, atol=1e-6)
    # bbox corners agree with the full grid's corners
    bbox = model.apply(
        variables,
        pc,
        True,
        method=lambda m, p, b: m.patch_embeddings.grid_sample_points(p, b),
    )
    np.testing.assert_allclose(np.asarray(bbox[0, 0, 0, 0]), g[0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(bbox[0, 0, -1, -1]), g[-1, -1], atol=1e-6)


def test_forward_shapes():
    cfg = _cfg()
    model = PredictiveViTModel(cfg)
    pix = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "glimpse": jax.random.PRNGKey(2)}, pix
    )
    out = model.apply(
        variables, pix, rngs={"glimpse": jax.random.PRNGKey(3)}, output_inputs=True
    )
    n = cfg.max_context_length
    assert out["last_hidden_state"].shape == (4, n + 2, 32)
    assert out["input_position"].shape == (4, n, 3)
    assert out["context_lengths"].shape == (4,)
    assert bool((out["context_lengths"] >= 1).all())
    assert bool(jnp.isfinite(out["last_hidden_state"]).all())
    # patch_config_scale row (1, -1) maps dof 2 (log-scale) u∈[-1,1] → [-2, 0]
    assert bool((out["input_position"][..., 2] <= 0.0).all())
    assert bool((out["input_position"][..., 2] >= -2.0).all())


def test_all_losses_finite_and_grads_flow():
    cfg = _cfg()
    model = PredictiveViTModel(cfg)
    pix = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "glimpse": jax.random.PRNGKey(2)}, pix
    )
    tc = PredictiveViTTrainingConfig(
        preservation=1.0,
        context_prediction=1.0,
        query_prediction=1.0,
        context_patch_prediction=1.0,
        query_patch_prediction=1.0,
        positional_recovery=1.0,
        positional_regularization=1.0,
    )

    def loss_fn(v):
        out = model.apply(
            v, pix, rngs={"glimpse": jax.random.PRNGKey(3)}, output_inputs=True
        )
        err, losses, meta = training_loss(model, v, pix, out, tc)
        return jnp.mean(err), (losses, meta)

    (loss, (losses, meta)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables
    )
    assert np.isfinite(float(loss))
    from msvit_tpu.models.predictive.losses import LOSS2FN

    assert set(losses) == set(LOSS2FN)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v).all()), k
    assert "predicted_query_patch" in meta
    # gradient reaches the conv encoder, deconv decoder, and pos decoder
    p = grads["params"]
    for path in (
        ("patch_embeddings", "enc0", "kernel"),
        ("patch_embeddings", "dec4", "kernel"),
        ("position_decoder_kernel",),
        ("prd_token",),
    ):
        g = p
        for k in path:
            g = g[k]
        assert float(jnp.abs(g).sum()) > 0.0, path


def test_normalize_latent_is_scale_invariant():
    """r5 (VERDICT r4 item 7): with normalize_latent the latent losses
    are invariant to a global rescale of the embeddings, while the raw
    ones scale quadratically."""
    from msvit_tpu.models.predictive.losses import _LATENT_LOSSES

    cfg = _cfg()
    model = PredictiveViTModel(cfg)
    pix = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "glimpse": jax.random.PRNGKey(2)},
        pix,
    )
    out = model.apply(
        v := variables, pix, rngs={"glimpse": jax.random.PRNGKey(3)},
        output_inputs=True,
    )

    def scaled(out, s):
        return {
            **out,
            "input_hidden_state": out["input_hidden_state"] * s,
            "last_hidden_state": out["last_hidden_state"] * s,
        }

    tc_norm = PredictiveViTTrainingConfig(
        preservation=1.0, normalize_latent=True
    )
    tc_raw = PredictiveViTTrainingConfig(preservation=1.0)
    _, l1, _ = training_loss(model, v, pix, out, tc_norm)
    _, l2, _ = training_loss(model, v, pix, scaled(out, 10.0), tc_norm)
    _, r1, _ = training_loss(model, v, pix, out, tc_raw)
    _, r2, _ = training_loss(model, v, pix, scaled(out, 10.0), tc_raw)
    assert set(l1) == {"preservation"} and "preservation" in _LATENT_LOSSES
    a, b = float(jnp.mean(l1["preservation"])), float(
        jnp.mean(l2["preservation"])
    )
    assert abs(a - b) / (abs(a) + 1e-9) < 0.02, (a, b)
    ra, rb = float(jnp.mean(r1["preservation"])), float(
        jnp.mean(r2["preservation"])
    )
    assert rb > 50.0 * ra  # raw loss blows up ~100x under a 10x rescale


def test_patch_mean_bar_semantics():
    """The bar equals the batch variance of the true patches (per-pixel
    mean predictor); a predictor emitting exactly the mean patch scores
    the bar, and the bar is 0 for identical patches."""
    from msvit_tpu.models.predictive.losses import patch_mean_bar

    cfg = _cfg()
    model = PredictiveViTModel(cfg)
    pix = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "glimpse": jax.random.PRNGKey(2)},
        pix,
    )
    out = model.apply(
        variables, pix, rngs={"glimpse": jax.random.PRNGKey(3)},
        output_inputs=True,
    )
    tc = PredictiveViTTrainingConfig(
        context_patch_prediction=1.0, query_patch_prediction=1.0
    )
    _, _, meta = training_loss(model, variables, pix, out, tc)
    bars = patch_mean_bar(out, meta, cfg)
    assert set(bars) == {"query_patch_mean_bar", "context_patch_mean_bar"}
    tq = np.asarray(meta["true_query_patch"], np.float32)
    manual = np.mean(
        np.sum(
            (tq - tq.mean(0, keepdims=True)).reshape(tq.shape[0], -1) ** 2, -1
        )
    ) / cfg.patch_size**2
    np.testing.assert_allclose(
        float(bars["query_patch_mean_bar"]), manual, rtol=1e-5
    )
    # identical patches -> zero bar
    same = {**meta, "true_query_patch": np.ones_like(tq)}
    assert float(patch_mean_bar(out, same, cfg)["query_patch_mean_bar"]) < 1e-9


def test_train_step_sandbox_config():
    """One jitted AdamW step with the sandbox/predictive.py objective
    (query_patch_prediction=1.0, context_patch=1e-4, pos_reg=0.5)."""
    cfg = _cfg()
    model = PredictiveViTModel(cfg)
    pix = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "glimpse": jax.random.PRNGKey(2)}, pix
    )
    tc = PredictiveViTTrainingConfig(
        context_patch_prediction=1e-4,
        query_patch_prediction=1.0,
        positional_regularization=0.5,
    )
    opt = optax.adamw(2e-3)
    state = opt.init(variables)

    @jax.jit
    def step(v, s, key):
        def loss_fn(v):
            out = model.apply(v, pix, rngs={"glimpse": key}, output_inputs=True)
            err, _, _ = training_loss(model, v, pix, out, tc)
            return jnp.mean(err)

        loss, grads = jax.value_and_grad(loss_fn)(v)
        updates, s = opt.update(grads, s, v)
        return optax.apply_updates(v, updates), s, loss

    for i in range(2):
        variables, state, loss = step(variables, state, jax.random.PRNGKey(i))
        assert np.isfinite(float(loss))
