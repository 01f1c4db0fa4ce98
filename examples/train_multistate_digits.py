"""Multistate on REAL data, fully offline — the reference's documented
bootstrap on weights trained in this framework:

  1. train a small base ViT classifier on the sklearn digits set
     (as examples/train_digits.py);
  2. bootstrap the multistate encoder from that checkpoint —
     embeddings + trunk layers copied, TX/RX tokens from the trained
     CLS token (`compat.family_import.transfer_base_to_multistate`, the
     flax→flax counterpart of the reference's pretrained load,
     `modeling_msvitencoder.py:681-690`);
  3. reference-style policy fine-tune: trunk frozen, only the TX/RX
     tokens and the linear head over occupancy-pooled TX tokens train
     (mirrors `sandbox/subsample_vit.py:83-124`'s train-the-policy-only
     stance);
  4. report test accuracy: base model vs bootstrapped multistate.

Why it matters: the multistate family's accuracy story otherwise rests
on random-init parity (the real dino-vitb8 oracle needs a network this
container doesn't have).  Here every multistate-specific mechanism —
clustering, TX/RX duplication, masked attention, occupancy pooling —
runs downstream of genuinely TRAINED features with a real labeled task.

    python examples/train_multistate_digits.py                # full
    python examples/train_multistate_digits.py --steps 120 --ms-steps 120

Measured on the chip (defaults): multistate reaches **95.0% (seed 0)
/ 95.3% (seed 1)** test top-1 with the trunk frozen and only TX/RX +
head trained (400 steps, ~22 s device time), vs the base classifier's
93.3 / 96.7 on the same seeds — i.e. the cluster-pooled TX readout is
comparable to the CLS head (above it on one seed, below on the other;
the multistate number is notably stabler across seeds), with every
multistate mechanism (clustering, TX/RX duplication, masked attention,
occupancy pooling) downstream of real trained features.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600, help="base ViT steps")
    ap.add_argument("--ms-steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=6e-4)
    ap.add_argument("--ms-lr", type=float, default=3e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--unfreeze", action="store_true",
        help="fine-tune the whole multistate model, not just TX/RX + head",
    )
    args = ap.parse_args()

    from msvit_tpu.compat.family_import import transfer_base_to_multistate
    from msvit_tpu.data.augment import random_brightness_contrast
    from msvit_tpu.data.digits import eval_batches, iter_epochs, load_digits_arrays
    from msvit_tpu.eval import evaluate
    from msvit_tpu.models.base import BaseViTConfig
    from msvit_tpu.models.base.vit import ViTForImageClassification
    from msvit_tpu.models.clustering import SpectralClusteringConfig
    from msvit_tpu.models.multistate import (
        MultiStateViTConfig,
        MultiStateViTForImageClassification,
    )
    from msvit_tpu.train.loop import make_optimizer
    from msvit_tpu.train.trainer import Trainer

    data = load_digits_arrays(image_size=32, seed=args.seed)
    print(
        f"digits: {len(data['train_images'])} train /"
        f" {len(data['test_images'])} test"
    )

    # ---- phase 1: base ViT (same trunk shape as train_digits) ----------
    cfg = BaseViTConfig(
        hidden_size=256,
        num_hidden_layers=6,
        num_attention_heads=4,
        image_size=32,
        patch_size=4,
        hidden_dropout_prob=0.1,
    )
    model = ViTForImageClassification(cfg, num_labels=10)
    rng = jax.random.PRNGKey(args.seed)
    params = jax.jit(model.init)(
        {"params": rng}, jnp.zeros((1, 32, 32, 3))
    )["params"]

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=max(args.steps // 20, 1),
        decay_steps=args.steps,
    )

    def base_loss(p, batch, key):
        images, labels = batch
        k_aug, k_drop = jax.random.split(key)
        images = random_brightness_contrast(k_aug, images)
        logits = model.apply(
            {"params": p}, images, deterministic=False,
            rngs={"dropout": k_drop},
        )
        loss = jnp.mean(
            optax.softmax_cross_entropy(logits, jax.nn.one_hot(labels, 10))
        )
        return loss, {"loss": loss}

    trainer = Trainer(
        base_loss, optax.adamw(schedule, weight_decay=0.05), params,
        log_every=100,
    )
    t0 = time.perf_counter()
    trainer.fit(
        iter_epochs(
            data["train_images"], data["train_labels"], args.batch,
            seed=args.seed, max_steps=args.steps,
        ),
        num_steps=args.steps,
        rng=rng,
    )
    print(f"base trained {args.steps} steps in {time.perf_counter()-t0:.1f}s")

    test = lambda: eval_batches(  # noqa: E731
        data["test_images"], data["test_labels"], 256
    )
    base_acc = evaluate(
        lambda p, pix: model.apply({"params": p}, pix),
        trainer.params, test(), topk=(1,),
    )["top1_acc"]
    print(f"base ViT test top-1: {base_acc:.4f}")

    # ---- phase 2: bootstrap multistate from the trained checkpoint -----
    ms_cfg = MultiStateViTConfig(
        hidden_size=256,
        num_hidden_layers=6,
        num_attention_heads=4,
        image_size=32,
        patch_size=4,
        pregeneration_period=2,
        generation_period=2,
        clustering=SpectralClusteringConfig(
            ncut_dim=4,
            num_sample=64,
            max_clusters=8,
            eigenvalue_threshold=0.1,
            ncut_dist="rbf",
        ),
    )
    ms_model = MultiStateViTForImageClassification(ms_cfg, num_labels=10)
    ms_vars = jax.jit(ms_model.init)(
        {"params": rng, "clustering": rng},
        jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1,), jnp.int32),
    )
    p = dict(ms_vars["params"])
    p["encoder"] = transfer_base_to_multistate(
        trainer.params["vit"], p["encoder"], ms_cfg.num_hidden_layers
    )
    ms_vars = {**ms_vars, "params": p}

    # ---- phase 3: policy fine-tune (trunk frozen) -----------------------
    def ms_loss(variables, batch, key):
        images, labels = batch
        out = ms_model.apply(variables, images, labels, rng=key)
        acc = jnp.mean(
            (jnp.argmax(out["logits"], -1) == labels).astype(jnp.float32)
        )
        return out["loss"], {"acc": acc}

    trainable = (
        None
        if args.unfreeze
        else (
            lambda path: any(
                n in ("transmitter_token", "receiver_token", "classifier")
                for n in path
            )
        )
    )
    ms_trainer = Trainer(
        ms_loss,
        make_optimizer(args.ms_lr, trainable=trainable),
        ms_vars,
        log_every=100,
    )
    t0 = time.perf_counter()
    ms_trainer.fit(
        iter_epochs(
            data["train_images"], data["train_labels"], args.batch,
            seed=args.seed + 1, max_steps=args.ms_steps,
        ),
        num_steps=args.ms_steps,
        rng=jax.random.PRNGKey(args.seed + 7),
    )
    print(
        f"multistate fine-tuned {args.ms_steps} steps "
        f"({'full' if args.unfreeze else 'TX/RX + head only'}) "
        f"in {time.perf_counter()-t0:.1f}s"
    )

    eval_key = jax.random.PRNGKey(123)
    ms_acc = evaluate(
        lambda v, pix: ms_model.apply(v, pix, rng=eval_key)["logits"],
        ms_trainer.params, test(), topk=(1,),
    )["top1_acc"]
    print(
        f"multistate test top-1: {ms_acc:.4f} "
        f"(base {base_acc:.4f}, Δ {ms_acc - base_acc:+.4f})"
    )


if __name__ == "__main__":
    main()
