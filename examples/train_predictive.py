"""Predictive training — the `sandbox/predictive.py` workflow
(reference `:48-137`): scaling glimpse config, patch 64, scale rows
((1,0),(1,0),(1,-1)), no CLS, losses {context_patch 1e-4,
query_patch 1.0, pos_reg 0.5}, AdamW(2e-3).

    python examples/train_predictive.py [--steps 10] [--batch 64]
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
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dataset", default=None)
    ap.add_argument(
        "--pretrained",
        default=None,
        help="checkpoint path, hub-layout dir, or HF hub id (hub needs network)",
    )
    args = ap.parse_args()

    from msvit_tpu.models.predictive import (
        PredictiveViTConfig,
        PredictiveViTModel,
        PredictiveViTTrainingConfig,
        training_loss,
    )

    cfg = PredictiveViTConfig(
        use_cls_token=False,
        patch_config="scaling",
        default_patch_scale=0.4,
        patch_config_scale=((1.0, 0.0), (1.0, 0.0), (1.0, -1.0)),
        patch_size=64,
        expected_context_length=2.0,
        max_context_length=6,
    )
    model = PredictiveViTModel(cfg)
    tc = PredictiveViTTrainingConfig(
        context_patch_prediction=1e-4,
        query_patch_prediction=1.0,
        positional_regularization=0.5,
    )
    rng = jax.random.PRNGKey(1212)

    def get_batch(i):
        if args.dataset:
            from msvit_tpu.data import load_image_batches

            if not hasattr(get_batch, "_it"):
                get_batch._it = load_image_batches(
                    args.dataset, batch_size=args.batch, shuffle_seed=0
                )
            return jnp.asarray(next(get_batch._it)["pixel_values"])
        return jax.random.normal(
            jax.random.PRNGKey(1000 + i), (args.batch, 224, 224, 3)
        )

    pix = get_batch(0)
    variables = jax.jit(model.init)(
        {"params": rng, "glimpse": rng}, pix[:2]
    )
    if args.pretrained:
        # encoder weights + CLS only (reference `modeling_spvitencoder.py
        # :498-509` — the glimpse tokenizer is never pretrained)
        from msvit_tpu.compat import import_into_predictive, load_state_dict_from

        sd = load_state_dict_from(args.pretrained)
        variables = {
            **variables,
            "params": import_into_predictive(sd, cfg, variables["params"]),
        }
    opt = optax.adamw(2e-3)
    opt_state = opt.init(variables)

    @jax.jit
    def step(v, s, pix, key):
        def loss_fn(v):
            out = model.apply(v, pix, rngs={"glimpse": key}, output_inputs=True)
            err, losses, _ = training_loss(model, v, pix, out, tc)
            return jnp.mean(err), losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(v)
        updates, s = opt.update(grads, s, v)
        return optax.apply_updates(v, updates), s, loss, losses

    for i in range(args.steps):
        variables, opt_state, loss, losses = step(
            variables, opt_state, get_batch(i), jax.random.PRNGKey(i)
        )
        parts = "  ".join(f"{k}={float(jnp.mean(v)):.4f}" for k, v in losses.items())
        print(f"iter {i}: loss {float(loss):.4f}  ({parts})")
    print("done")


if __name__ == "__main__":
    main()
