"""Saccadic loss library: differentiable objectives train the pattern
bank/refiner; trace diagnostics are finite."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from msvit_tpu.models.saccadic import (
    SaccadicViTConfig,
    SaccadicViTModel,
    SaccadicViTMultiStatePattern,
    TransformerSaccadicViTPredictor,
)
from msvit_tpu.models.saccadic.losses import (
    pattern_nll_loss,
    refiner_preservation_loss,
    trace_losses,
)
from msvit_tpu.settings import parity_policy


def _cfg():
    return SaccadicViTConfig(
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


def test_pattern_nll_trains():
    cfg = _cfg()
    pattern = SaccadicViTMultiStatePattern(cfg)
    h = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 16))
    c = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 16))
    variables = pattern.init(jax.random.PRNGKey(2), h, c, 0)

    opt = optax.adam(1e-2)
    state = opt.init(variables)

    @jax.jit
    def step(v, s):
        loss, grads = jax.value_and_grad(
            lambda v: pattern_nll_loss(pattern, v, h, c)
        )(v)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(v, updates), s, loss

    losses = []
    v = variables
    for _ in range(8):
        v, state, loss = step(v, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # the NLL of the matched data must drop as patterns fit it
    assert losses[-1] < losses[0]


def test_refiner_preservation_grads():
    cfg = _cfg()
    pattern = SaccadicViTMultiStatePattern(cfg)
    predictor = TransformerSaccadicViTPredictor(cfg)
    h = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 16))
    pv = pattern.init(jax.random.PRNGKey(2), h, c, 1)
    matches = pattern.apply(pv, h, c, 1)
    rv = predictor.init(jax.random.PRNGKey(3), h, c, matches)

    def loss_fn(rv):
        err, aux = refiner_preservation_loss(
            pattern, predictor, pv, rv, h, c
        )
        return err

    loss, grads = jax.value_and_grad(loss_fn)(rv)
    assert np.isfinite(float(loss))
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert total > 0.0


def test_trace_losses_finite():
    cfg = _cfg()
    model = SaccadicViTModel(cfg)
    pix = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1), pix)
    out = model.forward(variables, pix, max_trace_length=5, max_saccade_length=3)
    losses = trace_losses(
        out["trace"], variables["embeddings"], model.embeddings
    )
    assert set(losses) == {"predictive", "positional_recovery", "preservation"}
    for v in losses.values():
        assert np.isfinite(v)
