"""Eval loop (msvit_tpu/eval.py): top-k accuracy and loss accumulation
against a hand-computed golden, padded-last-batch masking, single-program
reuse across batches."""

import numpy as np

import jax.numpy as jnp

from msvit_tpu.eval import evaluate, make_eval_step


def _logits_fn(params, x):
    # "model": logits = x @ W, params is W
    return x @ params


def test_eval_matches_numpy_golden():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((8, 10)).astype(np.float32))
    xs = rng.standard_normal((50, 8)).astype(np.float32)
    ys = rng.integers(0, 10, size=(50,))

    logits = xs @ np.asarray(w)
    order = np.argsort(-logits, axis=-1)
    top1 = (order[:, 0] == ys).mean()
    top5 = np.mean([y in o[:5] for o, y in zip(order, ys)])
    # batches of 16 → last batch has 2 real rows, 14 padded
    batches = [
        {"pixel_values": xs[i : i + 16], "labels": ys[i : i + 16]}
        for i in range(0, 50, 16)
    ]
    out = evaluate(_logits_fn, w, batches, topk=(1, 5))
    assert out["n"] == 50
    np.testing.assert_allclose(out["top1_acc"], top1, atol=1e-6)
    np.testing.assert_allclose(out["top5_acc"], top5, atol=1e-6)

    # loss golden
    z = logits - logits.max(-1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(-1, keepdims=True))
    ce = -logp[np.arange(50), ys]
    np.testing.assert_allclose(out["loss"], ce.mean(), rtol=1e-5)


def test_eval_step_padding_mask():
    w = jnp.eye(4, dtype=jnp.float32)
    step = make_eval_step(_logits_fn, topk=(1,))
    x = jnp.eye(4)  # logits = identity → always correct
    labels = jnp.arange(4)
    valid = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    out = step(w, x, labels, valid)
    assert float(out["n"]) == 2.0
    assert float(out["correct@1"]) == 2.0
