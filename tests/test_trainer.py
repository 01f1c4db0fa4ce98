"""Trainer: fit converges on a toy problem, checkpoints and resumes."""

import itertools
import json
import os

import numpy as np

import jax
import jax.numpy as jnp
import optax

from msvit_tpu.train.trainer import Trainer


def _toy():
    target = jnp.asarray([1.0, -2.0, 3.0])

    def loss_fn(params, batch, rng):
        pred = batch @ params["w"]
        want = batch @ target
        loss = jnp.mean((pred - want) ** 2)
        return loss, {"mse": loss}

    params = {"w": jnp.zeros(3)}
    batches = (
        jax.random.normal(jax.random.PRNGKey(i), (16, 3)) for i in itertools.count()
    )
    return loss_fn, params, batches


def test_trainer_converges_and_logs(tmp_path):
    loss_fn, params, batches = _toy()
    metrics_path = str(tmp_path / "metrics.jsonl")
    tr = Trainer(
        loss_fn,
        optax.adam(0.1),
        params,
        metrics_path=metrics_path,
        log_every=10,
        donate=False,
    )
    final = tr.fit(batches, num_steps=200, rng=jax.random.PRNGKey(0))
    assert final < 1e-2
    records = [json.loads(l) for l in open(metrics_path)]
    assert records and records[-1]["step"] == 200
    assert "mse" in records[-1]


def test_grad_accumulation_matches_full_batch():
    """num_microbatches=4 must produce the same update as the full-batch
    step (mean-reduced loss, equal microbatch sizes, rng-independent
    loss)."""
    from msvit_tpu.train.loop import train_step_fn

    loss_fn, params, _ = _toy()
    batch = jax.random.normal(jax.random.PRNGKey(7), (16, 3))
    opt = optax.adamw(1e-2)

    step1 = train_step_fn(loss_fn, opt, donate=False)
    p1, _, l1, aux1 = step1(params, opt.init(params), batch,
                            jax.random.PRNGKey(0))

    step4 = train_step_fn(loss_fn, opt, donate=False, num_microbatches=4)
    p4, _, l4, aux4 = step4(params, opt.init(params), batch,
                            jax.random.PRNGKey(0))

    # microbatch-mean of per-microbatch MSE == full-batch MSE
    np.testing.assert_allclose(float(l4), float(l1), rtol=1e-6)
    np.testing.assert_allclose(float(aux4["mse"]), float(aux1["mse"]),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p4["w"]), np.asarray(p1["w"]), atol=1e-6
    )


def test_trainer_checkpoint_resume(tmp_path):
    loss_fn, params, batches = _toy()
    ckpt = str(tmp_path / "ck")
    tr = Trainer(
        loss_fn, optax.adam(0.1), params, checkpoint_dir=ckpt,
        save_every=50, donate=False,
    )
    tr.fit(batches, num_steps=100, rng=jax.random.PRNGKey(0))
    w_trained = np.asarray(tr.params["w"])

    # fresh trainer resumes from step 100
    loss_fn2, params2, batches2 = _toy()
    tr2 = Trainer(
        loss_fn2, optax.adam(0.1), params2, checkpoint_dir=ckpt,
        save_every=50, donate=False,
    )
    step = tr2.restore()
    assert step == 100
    np.testing.assert_allclose(np.asarray(tr2.params["w"]), w_trained)


def test_monitor_skips_nonfinite_and_reports_grad_norm(tmp_path):
    import optax

    # loss goes NaN on batches whose first element is negative
    def loss_fn(params, batch, rng):
        bad = batch[0, 0] < 0
        loss = jnp.where(bad, jnp.nan, jnp.mean((batch @ params["w"]) ** 2))
        return loss, {}

    good = jnp.ones((4, 3))
    bad = -jnp.ones((4, 3))
    metrics_path = str(tmp_path / "m.jsonl")
    tr = Trainer(
        loss_fn, optax.sgd(0.1), {"w": jnp.ones(3)},
        monitor=True, donate=False, log_every=1, metrics_path=metrics_path,
    )
    w0 = np.asarray(tr.params["w"]).copy()
    tr.fit(iter([bad, good]), 2, jax.random.PRNGKey(0))
    # the non-finite step was SKIPPED on device, the good one applied
    assert not np.array_equal(np.asarray(tr.params["w"]), w0)
    lines = [json.loads(l) for l in open(metrics_path)]
    assert any("grad_norm" in l for l in lines)
    finite_flags = [l["grads_finite"] for l in lines if "grads_finite" in l]
    assert 0.0 in finite_flags and 1.0 in finite_flags


def test_trainer_ema_tracks_params(tmp_path):
    """ema_decay: the fused EMA equals a hand-rolled EMA of the per-step
    params, is checkpointed, and restores on resume."""
    loss_fn, params, _ = _toy()
    decay = 0.9

    def batch_at(i):
        return jax.random.normal(jax.random.PRNGKey(100 + i), (16, 3))

    # reference run: plain trainer, EMA tracked by hand in python
    tr_ref = Trainer(loss_fn, optax.adam(0.1), params, donate=False)
    ema_ref = jax.tree.map(lambda x: jnp.array(x), params)
    for i in range(5):
        tr_ref.fit(iter([batch_at(i)]), num_steps=i + 1,
                   rng=jax.random.PRNGKey(0))
        ema_ref = jax.tree.map(
            lambda e, p: decay * e + (1 - decay) * p, ema_ref, tr_ref.params
        )

    ckpt_dir = str(tmp_path / "ckpt")
    tr = Trainer(
        loss_fn, optax.adam(0.1), params, donate=False,
        ema_decay=decay, checkpoint_dir=ckpt_dir, save_every=5,
    )
    tr.fit(iter([batch_at(i) for i in range(5)]), num_steps=5,
           rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(tr.ema_params["w"]), np.asarray(ema_ref["w"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(tr.params["w"]), np.asarray(tr_ref.params["w"]),
        rtol=1e-5, atol=1e-6,
    )
    # EMA lags the raw params (decay < 1, params still moving)
    assert not np.allclose(
        np.asarray(tr.ema_params["w"]), np.asarray(tr.params["w"])
    )

    # resume restores the EMA tree
    tr2 = Trainer(
        loss_fn, optax.adam(0.1), params, donate=False,
        ema_decay=decay, checkpoint_dir=ckpt_dir,
    )
    assert tr2.restore() == 5
    np.testing.assert_allclose(
        np.asarray(tr2.ema_params["w"]), np.asarray(tr.ema_params["w"])
    )
