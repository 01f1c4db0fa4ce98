"""Multistate fine-tuning — the missing training story for this family
(the reference only runs inference, `sandbox/test.py:42-83`).  Mirrors
the reference's policy-only style (`sandbox/subsample_vit.py:83-124`):
the trunk stays frozen, and only the transmitter/receiver tokens plus a
linear classifier over the occupancy-pooled TX tokens train.

    python examples/train_multistate.py [--steps 10] [--batch 8]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--labels", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--num-sample", type=int, default=256)
    ap.add_argument(
        "--pretrained",
        default=None,
        help="checkpoint path, hub-layout dir, or HF hub id (hub needs network)",
    )
    args = ap.parse_args()

    from msvit_tpu.models.clustering import SpectralClusteringConfig
    from msvit_tpu.models.multistate import (
        MultiStateViTConfig,
        MultiStateViTForImageClassification,
    )
    from msvit_tpu.train.loop import make_optimizer
    from msvit_tpu.train.trainer import Trainer

    cfg = MultiStateViTConfig(
        patch_size=16,
        image_size=224,
        pregeneration_period=4,
        generation_period=2,
        clustering=SpectralClusteringConfig(
            ncut_dim=8,
            num_sample=args.num_sample,
            max_clusters=16,
            eigenvalue_threshold=0.1,
            ncut_dist="rbf",
        ),
    )
    model = MultiStateViTForImageClassification(cfg, num_labels=args.labels)
    rng = jax.random.PRNGKey(1212)

    if args.dataset:
        from msvit_tpu.data import load_image_batches

        batch = next(
            load_image_batches(args.dataset, batch_size=args.batch)
        )
        pix = jnp.asarray(batch["pixel_values"])
        labels = jnp.asarray(batch["labels"]) % args.labels
    else:
        pix = jax.random.normal(rng, (args.batch, 224, 224, 3))
        labels = jax.random.randint(rng, (args.batch,), 0, args.labels)

    params = jax.jit(model.init)(
        {"params": rng, "clustering": rng}, pix[:1], labels[:1]
    )
    if args.pretrained:
        # frozen pretrained trunk under the classifier (the reference's
        # bootstrap, `modeling_msvitencoder.py:681-690`)
        from msvit_tpu.compat import import_into_multistate, load_state_dict_from

        sd = load_state_dict_from(args.pretrained)
        p = dict(params["params"])
        p["encoder"] = import_into_multistate(sd, cfg, p["encoder"])
        params = {**params, "params": p}

    def loss_fn(params, batch, step_rng):
        pix, labels = batch
        out = model.apply(params, pix, labels, rng=step_rng)
        acc = jnp.mean(
            (jnp.argmax(out["logits"], -1) == labels).astype(jnp.float32)
        )
        return out["loss"], {"accuracy": acc}

    # reference style: only TX/RX tokens + the classifier head train
    trainable = lambda path: any(  # noqa: E731
        n in ("transmitter_token", "receiver_token", "classifier")
        for n in path
    )
    trainer = Trainer(
        loss_fn,
        make_optimizer(args.lr, trainable=trainable),
        params,
        log_every=1,
    )

    batches = ((pix, labels) for _ in range(args.steps))
    first = None
    for step in range(args.steps):
        trainer.params, trainer.opt_state, loss, aux = trainer.step_fn(
            trainer.params, trainer.opt_state, (pix, labels),
            jax.random.fold_in(rng, step),
        )
        loss = float(loss)
        first = loss if first is None else first
        print(f"step {step:3d}  loss {loss:8.4f}  acc {float(aux['accuracy']):.3f}")
    print(f"loss {first:.4f} -> {loss:.4f} ({'down' if loss < first else 'UP'})")


if __name__ == "__main__":
    main()
