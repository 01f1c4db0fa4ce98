"""Saccadic training — the training story the reference never finished
(`model/saccadic_encoder/design.txt:1-8` names the objectives; no sandbox
script trains this family).  TPU-native realization:

1. collect glimpse embeddings by running the jittable batched saccade
   controller (`batched_saccade_run`) over a batch of images;
2. split each image's trace into context (first glimpses) and hidden
   (later glimpses) pools;
3. optimize the Gaussian-mixture pattern bank (`pattern_nll_loss`) and
   the transformer refiner (`refiner_preservation_loss`) with AdamW.

    python examples/train_saccadic.py [--steps 10] [--batch 8]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--glimpses", type=int, default=8)
    ap.add_argument("--context", type=int, default=3)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--dataset", default=None)
    args = ap.parse_args()

    from msvit_tpu.models.saccadic import (
        SaccadicViTConfig,
        SaccadicViTMultiStatePattern,
        TransformerSaccadicViTPredictor,
    )
    from msvit_tpu.models.saccadic.batched import batched_saccade_run
    from msvit_tpu.models.saccadic.embeddings import SaccadicViTEmbeddings
    from msvit_tpu.models.saccadic.losses import (
        pattern_nll_loss,
        refiner_preservation_loss,
    )

    cfg = SaccadicViTConfig(
        hidden_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_patterns=((1, 64), (2, 64)),
        covariance_dim=16,
        beam_size=16,
        image_size=448,
        patch_size=128,
        patch_config="translation",
    )
    rng = jax.random.PRNGKey(1212)

    if args.dataset:
        from msvit_tpu.data import load_image_batches

        batch = next(
            load_image_batches(
                args.dataset, batch_size=args.batch, image_size=cfg.image_size
            )
        )
        pix = jnp.asarray(batch["pixel_values"])
    else:
        pix = jax.random.normal(
            rng, (args.batch, cfg.image_size, cfg.image_size, 3)
        )

    embeddings = SaccadicViTEmbeddings(cfg)
    pattern = SaccadicViTMultiStatePattern(cfg)
    predictor = TransformerSaccadicViTPredictor(cfg)

    k_e, k_p, k_r, rng = jax.random.split(rng, 4)
    emb_vars = embeddings.init(k_e, pix, jnp.zeros((args.batch, cfg.dof)))
    h0 = jnp.zeros((args.batch, 2, cfg.hidden_size))
    c0 = jnp.zeros((args.batch, args.context, cfg.hidden_size))
    pat_vars = pattern.init(k_p, h0, c0, 1)
    matches0 = pattern.apply(pat_vars, h0, c0, 1)
    ref_vars = predictor.init(k_r, h0, c0, matches0)

    # glimpse-embedding pools from the batched controller (data collection
    # is not differentiated — the pools are the training set)
    trace = batched_saccade_run(
        cfg,
        {"embeddings": emb_vars, "pattern": pat_vars},
        pix,
        num_steps=args.glimpses,
    )
    emb_pool = jnp.swapaxes(trace["embeddings"], 0, 1)  # [B, T, D]
    context = jax.lax.stop_gradient(emb_pool[:, : args.context])
    hidden = jax.lax.stop_gradient(emb_pool[:, args.context :])
    print(
        f"collected pools: hidden {hidden.shape}, context {context.shape}, "
        f"{int(trace['num_saccades'].sum())} completed saccades"
    )

    params = {"pattern": pat_vars, "refiner": ref_vars}
    opt = optax.adamw(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state):
        def loss_fn(params):
            nll = pattern_nll_loss(pattern, params["pattern"], hidden, context)
            pres, aux = refiner_preservation_loss(
                pattern,
                predictor,
                params["pattern"],
                params["refiner"],
                hidden,
                context,
            )
            return nll + pres, {"nll": nll, "preservation": pres, **aux}

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, parts

    first = last = None
    for step in range(args.steps):
        params, opt_state, loss, parts = train_step(params, opt_state)
        loss = float(loss)
        first = loss if first is None else first
        last = loss
        print(
            f"step {step:3d}  loss {loss:10.4f}  "
            f"nll {float(parts['nll']):10.4f}  "
            f"preservation {float(parts['preservation']):10.4f}"
        )
    print(f"loss {first:.4f} -> {last:.4f} ({'down' if last < first else 'UP'})")


if __name__ == "__main__":
    main()
