"""Offline real-data fixture (data/digits.py) + a short real training
run: the full Trainer → eval → int8 path on genuinely learned weights
(the workflow of examples/train_digits.py, shrunk for CPU).

No reference counterpart — the reference's oracle needs a network
(`sandbox/test.py:42-57`); this is the offline substitute (PARITY.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from msvit_tpu.data.digits import (
    eval_batches,
    iter_epochs,
    load_digits_arrays,
)


@pytest.fixture(scope="module")
def digits():
    return load_digits_arrays(image_size=32, seed=0)


def test_load_digits_shapes_and_split(digits):
    d = digits
    assert d["train_images"].shape[1:] == (32, 32, 3)
    assert d["train_images"].dtype == np.float32
    n = len(d["train_images"]) + len(d["test_images"])
    assert n == 1797
    # ~20% stratified test split, every class present on both sides
    assert 0.18 <= len(d["test_images"]) / n <= 0.22
    assert set(np.unique(d["train_labels"])) == set(range(10))
    assert set(np.unique(d["test_labels"])) == set(range(10))
    # normalized range
    assert d["train_images"].min() >= -1.0 - 1e-6
    assert d["train_images"].max() <= 1.0 + 1e-6
    # deterministic
    d2 = load_digits_arrays(image_size=32, seed=0)
    np.testing.assert_array_equal(d["test_labels"], d2["test_labels"])
    # pixel replication: each 4x4 block is constant
    img = d["train_images"][0, :, :, 0]
    assert np.all(img[0:4, 0:4] == img[0, 0])


def test_iter_epochs_static_shapes_and_reshuffle(digits):
    ims, labs = digits["train_images"][:100], digits["train_labels"][:100]
    batches = list(iter_epochs(ims, labs, batch_size=32, seed=1, max_steps=7))
    assert len(batches) == 7  # 3 per epoch (tail dropped), reshuffles
    assert all(b[0].shape == (32, 32, 32, 3) for b in batches)
    # different epochs produce different orderings
    assert not np.array_equal(batches[0][1], batches[3][1])


def test_digits_train_eval_int8_end_to_end(digits):
    """~150 steps of a tiny ViT must beat chance decisively; the int8
    path on the trained weights must stay close to bf16."""
    from msvit_tpu.eval import evaluate
    from msvit_tpu.models.base import BaseViTConfig
    from msvit_tpu.models.base.quantized import (
        calibrate_act_scales,
        quantize_vit_params,
        quantized_vit_apply,
    )
    from msvit_tpu.models.base.vit import ViTForImageClassification
    from msvit_tpu.train.trainer import Trainer

    cfg = BaseViTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        image_size=32,
        patch_size=8,
        attn_implementation="xla",
    )
    model = ViTForImageClassification(cfg, num_labels=10)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, jnp.zeros((1, 32, 32, 3)))["params"]

    def loss_fn(p, batch, key):
        images, labels = batch
        logits = model.apply({"params": p}, images)
        loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        )
        return loss, {}

    trainer = Trainer(loss_fn, optax.adamw(3e-3), params)
    ims, labs = digits["train_images"], digits["train_labels"]
    first = float(loss_fn(params, (jnp.asarray(ims[:64]), jnp.asarray(labs[:64])), rng)[0])
    trainer.fit(
        iter_epochs(ims, labs, 64, max_steps=150), num_steps=150, rng=rng
    )

    def logits_fn(p, pix):
        return model.apply({"params": p}, pix)

    test = list(eval_batches(digits["test_images"], digits["test_labels"], 128))
    res = evaluate(logits_fn, trainer.params, iter(test), topk=(1,))
    assert res["n"] == len(digits["test_images"])
    assert res["loss"] < first  # learned something
    assert res["top1_acc"] > 0.35  # chance is 0.1 (measured ~0.47)

    # int8 on the trained weights (interpret-mode kernels off CPU)
    qtrunk = quantize_vit_params(trainer.params["vit"])
    scales = calibrate_act_scales(qtrunk, cfg, jnp.asarray(ims[:64]))
    head = trainer.params["classifier"]

    def int8_logits(p, pix):
        feats = quantized_vit_apply(
            p[0], cfg, pix, act_scales=p[1], use_kernels=False
        )
        cls = feats[:, 0].astype(jnp.float32)
        return cls @ p[2]["kernel"].astype(jnp.float32) + p[2]["bias"]

    q = evaluate(int8_logits, (qtrunk, scales, head), iter(test), topk=(1,))
    assert q["top1_acc"] > res["top1_acc"] - 0.1
