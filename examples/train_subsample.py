"""Subsample REINFORCE training — the `sandbox/subsample_vit.py` workflow
(reference `:52-126`): 6-layer trunk, grid 4, policy-only AdamW(1e-3),
loss = batch-standardized CE × episode log-prob.

Synthetic data by default; --dataset streams from the HF hub.

    python examples/train_subsample.py [--steps 20] [--batch 32]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--visualize-every", type=int, default=0)
    ap.add_argument(
        "--pretrained",
        default=None,
        help="checkpoint path, hub-layout dir, or HF hub id (hub needs network)",
    )
    args = ap.parse_args()

    from msvit_tpu.models.subsample import (
        SubsampleViTConfig,
        SubsampleViTForImageClassification,
        reinforce_loss,
    )
    from msvit_tpu.train.loop import make_optimizer

    cfg = SubsampleViTConfig(
        num_hidden_layers=6,
        image_size=224,
        patch_size=14,
        initial_grid_size=4,
        multiplicative_grid_size=2,
        nesting_mode="open",
        max_depth=1,
        num_labels=1000,
    )
    model = SubsampleViTForImageClassification(cfg)
    rng = jax.random.PRNGKey(1212)

    def batches():
        if args.dataset:
            from msvit_tpu.data import load_image_batches

            yield from load_image_batches(
                args.dataset, batch_size=args.batch, shuffle_seed=0
            )
        else:
            k = jax.random.PRNGKey(0)
            while True:
                k, k1, k2 = jax.random.split(k, 3)
                yield {
                    "pixel_values": jax.random.normal(
                        k1, (args.batch, 224, 224, 3)
                    ),
                    "labels": jax.random.randint(
                        k2, (args.batch,), 0, cfg.num_labels
                    ),
                }

    it = iter(batches())
    first = next(it)
    pix0 = jnp.asarray(first["pixel_values"])
    labels0 = jnp.asarray(first["labels"])
    variables = jax.jit(model.init)(
        {"params": rng, "policy": rng}, pix0[:1], labels0[:1]
    )
    if args.pretrained:
        # AutoModel-style partial load (reference `modeling_ssvit.py:235-249`)
        from msvit_tpu.compat import import_into_subsample, load_state_dict_from

        sd = load_state_dict_from(args.pretrained)
        variables = {
            **variables,
            "params": import_into_subsample(sd, cfg, variables["params"]),
        }

    # train only the subdivision policy (reference `:85-88`)
    opt = make_optimizer(1e-3, trainable=lambda path: "projection" in path)
    opt_state = opt.init(variables)

    @jax.jit
    def step(v, s, pix, labels, key):
        def loss_fn(v):
            out = model.apply(v, pix, labels, rngs={"policy": key})
            return reinforce_loss(out["loss"], out["log_prob"]), out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(v)
        updates, s = opt.update(grads, s, v)
        return optax.apply_updates(v, updates), s, loss, jnp.mean(out["loss"])

    batch = first
    for i in range(args.steps):
        pix = jnp.asarray(batch["pixel_values"])
        labels = jnp.asarray(batch["labels"])
        variables, opt_state, loss, ce = step(
            variables, opt_state, pix, labels, jax.random.PRNGKey(i)
        )
        if i % 5 == 0:
            print(
                f"iter {i}: normalized loss {float(loss):+.4f}  mean CE {float(ce):.4f}"
            )
        if args.visualize_every and i % args.visualize_every == 0:
            from msvit_tpu.models.subsample import build_quadtree
            from msvit_tpu.viz import visualize_subsample_output

            out = model.apply(
                variables,
                pix,
                labels,
                rngs={"policy": jax.random.PRNGKey(i)},
                output_logs=True,
                return_pixel_values=True,
            )
            visualize_subsample_output(
                out, build_quadtree(cfg), show=False,
                save_path=f"subsample_{i}.png",
            )
        batch = next(it)
    print("done")


if __name__ == "__main__":
    main()
