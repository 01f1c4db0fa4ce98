"""Subsample encoder tests (SURVEY §4 (c)/(d)): quadtree geometry vs the
reference's subdivision math, fixed-PRNG forwards per nesting mode, mask
invariants, and the REINFORCE gradient path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from msvit_tpu.models.subsample import (
    QuadTree,
    SubsampleViTConfig,
    SubsampleViTForImageClassification,
    SubsampleViTModel,
    build_quadtree,
    reinforce_loss,
)
from msvit_tpu.models.subsample.model import subdivide_boxes
from msvit_tpu.settings import parity_policy


def _cfg(**kw):
    base = dict(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=64,
        patch_size=16,
        initial_grid_size=2,
        multiplicative_grid_size=2,
        max_depth=1,
        num_labels=5,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    base.update(kw)
    return SubsampleViTConfig(**base)


def _torch_subdivide(corners, grid):
    """Reference grid_sample_points corner math
    (`modeling_ssvit.py:92-99`) in torch, as a golden."""
    import torch

    l = torch.linspace(1.0, 0.0, grid + 1)
    g = torch.stack(
        (
            torch.stack(torch.meshgrid(l[:-1], l[:-1], indexing="ij"), dim=-1),
            torch.stack(torch.meshgrid(l[1:], l[1:], indexing="ij"), dim=-1),
        ),
        dim=-2,
    ).flatten(0, 1)
    grid_points = torch.stack((g, 1 - g), dim=-2)
    pc = torch.from_numpy(corners)
    return torch.sum(pc[..., None, None, :, :] * grid_points, dim=-2).numpy()


@pytest.mark.parametrize("grid", [2, 3, 4])
def test_subdivide_matches_reference_math(grid):
    rng = np.random.default_rng(0)
    corners = rng.uniform(-1, 1, (5, 2, 2)).astype(np.float32)
    got = subdivide_boxes(corners, grid)
    want = _torch_subdivide(corners, grid)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_quadtree_structure():
    cfg = _cfg(initial_grid_size=2, multiplicative_grid_size=2, max_depth=2)
    tree = build_quadtree(cfg)
    assert isinstance(tree, QuadTree)
    assert cfg.capacity == 4 + 16 + 64
    assert tree.corners.shape == (cfg.capacity, 2, 2)
    # children boxes nest inside their parent
    for s in range(cfg.capacity):
        p = tree.parent[s]
        if p < 0:
            continue
        (py0, px0), (py1, px1) = tree.corners[p]
        (cy0, cx0), (cy1, cx1) = tree.corners[s]
        lo_y, hi_y = min(py0, py1), max(py0, py1)
        lo_x, hi_x = min(px0, px1), max(px0, px1)
        assert lo_y - 1e-5 <= min(cy0, cy1) and max(cy0, cy1) <= hi_y + 1e-5
        assert lo_x - 1e-5 <= min(cx0, cx1) and max(cx0, cx1) <= hi_x + 1e-5
        assert tree.depth[s] == tree.depth[p] + 1
    # root boxes tile the image exactly
    assert np.isclose(tree.corners[: cfg.num_roots, 0].min(), -1.0)
    assert np.isclose(tree.corners[: cfg.num_roots, 1].max(), 1.0)


@pytest.mark.parametrize("mode", ["open", "lock", "freeze"])
def test_forward_shapes_and_masks(mode):
    cfg = _cfg(nesting_mode=mode)
    model = SubsampleViTModel(cfg)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (2, 64, 64, 3))
    params = model.init({"params": rng, "policy": rng}, pix)
    out = model.apply(
        params, pix, rngs={"policy": jax.random.PRNGKey(7)}, output_logs=True
    )
    cap = cfg.capacity
    assert out["last_hidden_state"].shape == (2, 1 + cap, cfg.hidden_size)
    assert out["last_valid_mask"].shape == (2, cap)
    assert out["log_prob"].shape == (2,)
    assert bool(jnp.isfinite(out["last_hidden_state"]).all())
    assert bool(jnp.isfinite(out["log_prob"]).all())
    # log_prob of sampled decisions is non-positive
    assert bool((out["log_prob"] <= 0).all())
    valid = np.asarray(out["last_valid_mask"])
    # a parent and its children are never both valid
    tree = build_quadtree(cfg)
    for s in range(cap):
        p = tree.parent[s]
        if p >= 0:
            assert not np.any(valid[:, s] & valid[:, p])
    # at least the roots-or-children cover: every batch row has >=1 valid
    assert valid.any(axis=1).all()


def test_classifier_and_reinforce_grads():
    cfg = _cfg(nesting_mode="open")
    model = SubsampleViTForImageClassification(cfg)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (4, 64, 64, 3))
    labels = jnp.asarray([0, 1, 2, 3])
    params = model.init({"params": rng, "policy": rng}, pix, labels)

    def loss_fn(p, key):
        out = model.apply(
            p, pix, labels, rngs={"policy": key}
        )
        return reinforce_loss(out["loss"], out["log_prob"]), out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, jax.random.PRNGKey(3)
    )
    assert out["loss"].shape == (4,)  # per-sample, non-reduced
    assert np.isfinite(float(loss))
    # the REINFORCE path must put gradient on the policy projection
    gproj = grads["params"]["model"]["projection"]["kernel"]
    assert float(jnp.abs(gproj).sum()) > 0.0


def test_training_step_decreases_nothing_nan():
    """Two optimizer steps on the policy params run finite (the
    sandbox/subsample_vit.py:83-126 loop, REINFORCE on policy only)."""
    cfg = _cfg(nesting_mode="open")
    model = SubsampleViTForImageClassification(cfg)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (4, 64, 64, 3))
    labels = jnp.asarray([0, 1, 2, 3])
    params = model.init({"params": rng, "policy": rng}, pix, labels)
    opt = optax.adamw(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        def loss_fn(p):
            out = model.apply(p, pix, labels, rngs={"policy": key})
            return reinforce_loss(out["loss"], out["log_prob"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    for i in range(2):
        params, state, loss = step(params, state, jax.random.PRNGKey(i))
        assert np.isfinite(float(loss))
