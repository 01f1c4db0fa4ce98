"""Checkpoint save/restore roundtrip, masked optimizer, viz smoke tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from msvit_tpu.train import restore_checkpoint, save_checkpoint
from msvit_tpu.train.loop import make_optimizer, train_step_fn


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))},
        "step": jnp.asarray(7),
    }
    save_checkpoint(str(tmp_path / "ckpt"), 7, state)
    like = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), like)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_masked_optimizer_freezes_params():
    params = {"policy": {"kernel": jnp.ones((3,))}, "trunk": {"kernel": jnp.ones((3,))}}
    opt = make_optimizer(0.1, trainable=lambda path: "policy" in path)
    state = opt.init(params)

    def loss_fn(p, batch, rng):
        return jnp.sum(p["policy"]["kernel"] ** 2) + jnp.sum(
            p["trunk"]["kernel"] ** 2
        ), {}

    step = train_step_fn(loss_fn, opt, donate=False)
    new_params, _, loss, _ = step(params, state, None, jax.random.PRNGKey(0))
    # trunk unchanged, policy moved
    np.testing.assert_allclose(np.asarray(new_params["trunk"]["kernel"]), 1.0)
    assert float(jnp.abs(new_params["policy"]["kernel"] - 1.0).sum()) > 0


def test_subsample_viz_smoke(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from msvit_tpu.models.subsample import (
        SubsampleViTConfig,
        SubsampleViTForImageClassification,
        build_quadtree,
    )
    from msvit_tpu.settings import parity_policy
    from msvit_tpu.viz import visualize_subsample_output

    cfg = SubsampleViTConfig(
        hidden_size=32,
        num_hidden_layers=1,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
        initial_grid_size=2,
        multiplicative_grid_size=2,
        max_depth=1,
        num_labels=3,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    model = SubsampleViTForImageClassification(cfg)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (3, 32, 32, 3))
    variables = model.init({"params": rng, "policy": rng}, pix)
    out = model.apply(
        variables,
        pix,
        rngs={"policy": rng},
        output_logs=True,
        return_pixel_values=True,
    )
    path = str(tmp_path / "quadtree.png")
    visualize_subsample_output(
        out, build_quadtree(cfg), num_ims=3, show=False, save_path=path
    )
    assert os.path.getsize(path) > 0


def test_color_and_ellipse():
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    from msvit_tpu.viz import color, confidence_ellipse

    c = color(30.0)
    assert c.shape == (3,) and (c >= 0).all() and (c <= 1).all()
    fig, ax = plt.subplots()
    rng = np.random.default_rng(0)
    confidence_ellipse(rng.standard_normal(50), rng.standard_normal(50), ax)
    plt.close(fig)
