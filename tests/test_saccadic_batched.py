"""Batched lockstep saccade runner: jittable, per-image convergence."""

import numpy as np

import jax
import jax.numpy as jnp

from msvit_tpu.models.saccadic import SaccadicViTConfig, SaccadicViTModel
from msvit_tpu.models.saccadic.batched import batched_saccade_run
from msvit_tpu.settings import parity_policy


def test_batched_run_shapes_and_convergence():
    cfg = SaccadicViTConfig(
        hidden_size=16,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_patterns=((1, 4), (2, 4)),
        covariance_dim=4,
        log_covariance_shift=0.0,
        beam_size=4,
        image_size=32,
        patch_size=16,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    model = SaccadicViTModel(cfg)
    pix = jax.random.normal(jax.random.PRNGKey(0), (3, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1), pix)

    t = 8
    run = jax.jit(
        lambda v, x: batched_saccade_run(
            cfg, v, x, num_steps=t, max_saccade_length=3
        )
    )
    trace = run(variables, pix)
    assert trace["queries"].shape == (t, 3, cfg.dof)
    assert trace["embeddings"].shape == (t, 3, 16)
    assert trace["converged"].shape == (t, 3)
    assert bool(jnp.isfinite(trace["embeddings"]).all())
    # max_saccade_length=3 over 8 steps forces >=2 convergences per image
    assert bool((trace["num_saccades"] >= 2).all())
    # first query is the image center
    np.testing.assert_allclose(np.asarray(trace["queries"][0]), 0.0)
    # after a converged step the next query resets to the center
    conv = np.asarray(trace["converged"])
    qs = np.asarray(trace["queries"])
    for step in range(t - 1):
        for i in range(3):
            if conv[step, i]:
                np.testing.assert_allclose(qs[step + 1, i], 0.0, atol=1e-6)
