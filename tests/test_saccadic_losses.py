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


def test_joint_training_step_decreases_loss():
    """The examples/train_saccadic.py objective (pattern NLL + refiner
    preservation, one AdamW over both) demonstrably reduces loss on pools
    collected from the batched controller."""
    from msvit_tpu.models.saccadic.batched import batched_saccade_run
    from msvit_tpu.models.saccadic import SaccadicViTEmbeddings

    cfg = _cfg()
    embeddings = SaccadicViTEmbeddings(cfg)
    pattern = SaccadicViTMultiStatePattern(cfg)
    predictor = TransformerSaccadicViTPredictor(cfg)

    pix = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    emb_vars = embeddings.init(
        jax.random.PRNGKey(1), pix, jnp.zeros((2, cfg.dof))
    )
    h0 = jnp.zeros((2, 2, cfg.hidden_size))
    c0 = jnp.zeros((2, 2, cfg.hidden_size))
    pat_vars = pattern.init(jax.random.PRNGKey(2), h0, c0, 1)
    ref_vars = predictor.init(
        jax.random.PRNGKey(3), h0, c0, pattern.apply(pat_vars, h0, c0, 1)
    )

    trace = batched_saccade_run(
        cfg, {"embeddings": emb_vars, "pattern": pat_vars}, pix, num_steps=5
    )
    pool = jnp.swapaxes(trace["embeddings"], 0, 1)
    context, hidden = pool[:, :2], pool[:, 2:]

    params = {"pattern": pat_vars, "refiner": ref_vars}
    opt = optax.adamw(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(params):
            nll = pattern_nll_loss(pattern, params["pattern"], hidden, context)
            pres, _ = refiner_preservation_loss(
                pattern, predictor, params["pattern"], params["refiner"],
                hidden, context,
            )
            return nll + pres

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for _ in range(8):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
