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
