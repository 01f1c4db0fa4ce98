"""Reference-scale supervised pretrain on the procedural 224px corpus.

The reference's implicit feature oracle is a hub-pretrained ViT-B/8 at
224px/784 tokens (`sandbox/test.py:42-57` loads `facebook/dino-vitb8`);
zero egress makes that download impossible here, so this script produces
the offline counterpart: a ViT-B/8 trained at the same geometry on the
synthetic corpus (`data/synthetic.py` — labels derived from generative
params).  Its checkpoint seeds the multistate bootstrap
(`train_multistate_synthetic.py`) and the subsample runs, exactly like
the reference's `from_pretrained` trunks seed its families.

Full input pipeline is exercised: scenes are JPEG-encoded to disk once,
then decoded through `native/decode.cpp` into a RAM-resident corpus
(one host core — per-step host decode would starve the chip).

    python examples/pretrain_synthetic.py                   # ViT-B/8 @224
    python examples/pretrain_synthetic.py --preset small    # smoke (tiny)

Outputs under --out (default runs/synthetic): corpus224/ (shared),
pretrain_<preset>/ckpt + metrics.jsonl, final eval accuracy printed and
saved to summary.json.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np
import optax


PRESETS = {
    # the reference trunk geometry: dino-vitb8 = ViT-B/8 @224, 784 tokens
    "b8": dict(hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
               patch_size=8, image_size=224),
    # ViT-S/8 — same 784-token geometry, 4x fewer params (fallback trunk
    # if B/8 from-scratch optimization stalls on the small corpus)
    "s8": dict(hidden_size=384, num_hidden_layers=12, num_attention_heads=6,
               patch_size=8, image_size=224),
    # 6-layer S/8: keeps the 224px/784-token geometry, halves the depth —
    # the from-scratch instability scales with depth (12-layer runs NaN
    # mid-run even in f32; the 6-layer CPU analog trains cleanly), and the
    # reference's own subsample sandbox uses a 6-layer trunk
    "s8d6": dict(hidden_size=384, num_hidden_layers=6, num_attention_heads=6,
                 patch_size=8, image_size=224),
    # ViT-B/16 — cheaper 197-token variant
    "b16": dict(hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
                patch_size=16, image_size=224),
    # smoke preset (also used by tests on CPU)
    "small": dict(hidden_size=128, num_hidden_layers=2, num_attention_heads=4,
                  patch_size=16, image_size=64),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="b8", choices=sorted(PRESETS))
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--weight-decay", type=float, default=0.05)
    ap.add_argument("--corpus-size", type=int, default=2048)
    ap.add_argument("--eval-size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="runs/synthetic")
    ap.add_argument(
        "--label-mode", default="largest", choices=["largest", "center", "texture", "ltexture"],
        help="'center' = glimpse-learnable target-object task (r5): the "
        "centered never-occluded object defines the label; 'largest' is "
        "the r3/r4 area-comparison task (recorded unlearnable at this "
        "scale)")
    ap.add_argument(
        "--max-objects", type=int, default=3,
        help="objects per scene; 1 + --label-mode center = single-object "
        "scenes (the easiest glimpse-learnable task)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--qk-norm", action="store_true",
                    help="ViT-22B-style per-head q/k LayerNorm — bounds "
                    "attention logits; the depth-12 from-scratch "
                    "stabilizer (config.qk_norm)")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"],
                    help="compute policy; f32 sidesteps the bf16 "
                    "grad-spike instability seen at depth-12 scale")
    ap.add_argument("--clip", type=float, default=1.0,
                    help="global grad-norm clip (0 disables)")
    ap.add_argument(
        "--layerscale", type=float, default=1e-5,
        help="LayerScale init — from-scratch deep-ViT stabilizer (DINOv2's "
        "1e-5); only the init changes, so family transfer is unaffected. "
        "The first b8 run without clip+small-layerscale plateaued at "
        "chance and diverged to NaN at lr 6e-4 (metrics.jsonl r4).",
    )
    args = ap.parse_args()

    from msvit_tpu.data.augment import random_brightness_contrast, random_flip
    from msvit_tpu.data.synthetic import (
        label_classes,
        corpus_batches,
        ensure_corpus,
        generate_batch,
    )
    from msvit_tpu.eval import evaluate
    from msvit_tpu.models.base import BaseViTConfig
    from msvit_tpu.models.base.vit import ViTForImageClassification
    from msvit_tpu.train import save_checkpoint
    from msvit_tpu.train.trainer import Trainer

    geom = PRESETS[args.preset]
    size = geom["image_size"]
    data = ensure_corpus(args.out, args.corpus_size, size=size,
                         seed=args.seed, label_mode=args.label_mode,
                         max_objects=args.max_objects)
    num_classes = len(label_classes(args.label_mode))
    mode_sfx = "" if args.label_mode == "largest" else f"_{args.label_mode}"
    if args.max_objects != 3:
        mode_sfx += f"_m{args.max_objects}"
    run_dir = os.path.join(args.out, f"pretrain_{args.preset}{mode_sfx}")
    os.makedirs(run_dir, exist_ok=True)

    policy_kw = {}
    if args.dtype == "f32":
        from msvit_tpu.settings import parity_policy

        policy_kw["policy"] = parity_policy()
    cfg = BaseViTConfig(
        **geom,
        hidden_dropout_prob=0.1,
        layerscale_value=args.layerscale,
        qk_norm=args.qk_norm,
        remat=args.remat,
        **policy_kw,
    )
    model = ViTForImageClassification(cfg, num_labels=num_classes)
    rng = jax.random.PRNGKey(args.seed)
    params = jax.jit(model.init)(
        {"params": rng}, jnp.zeros((1, size, size, 3))
    )["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    tokens = (size // geom["patch_size"]) ** 2
    print(f"preset {args.preset}: {n_params/1e6:.1f}M params, "
          f"{tokens} patch tokens, corpus {len(data['labels'])}")

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=max(args.steps // 20, 1),
        decay_steps=args.steps,
    )
    optimizer = optax.adamw(schedule, weight_decay=args.weight_decay)
    if args.clip > 0:
        optimizer = optax.chain(
            optax.clip_by_global_norm(args.clip), optimizer
        )

    def loss_fn(p, batch, key):
        k_aug, k_flip, k_drop = jax.random.split(key, 3)
        # uint8 wire format; normalize on device (fuses into patchify)
        pix = batch["pixel_values"].astype(jnp.float32) / 127.5 - 1.0
        images = random_flip(
            k_flip, random_brightness_contrast(k_aug, pix)
        )
        logits = model.apply(
            {"params": p}, images, deterministic=False,
            rngs={"dropout": k_drop},
        )
        loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["labels"]
            )
        )
        return loss, {"loss": loss}

    trainer = Trainer(
        loss_fn, optimizer, params, monitor=True, log_every=50,
        metrics_path=os.path.join(run_dir, "metrics.jsonl"),
    )

    def device_batches():
        for b in corpus_batches(data, args.batch, seed=args.seed, uint8=True):
            yield {
                "pixel_values": jnp.asarray(b["pixel_values"]),
                "labels": jnp.asarray(b["labels"]),
            }

    t0 = time.perf_counter()
    final_loss = trainer.fit(device_batches(), num_steps=args.steps, rng=rng)
    dt = time.perf_counter() - t0
    print(f"trained {trainer.step} steps in {dt:.1f}s "
          f"({trainer.step * args.batch / dt:.0f} img/s incl. compile), "
          f"final loss {final_loss:.4f}")

    # held-out eval: fresh generative seeds the corpus never used
    hold = generate_batch(
        range(10_000_000, 10_000_000 + args.eval_size), size=size,
        label_mode=args.label_mode, max_objects=args.max_objects,
    )
    eval_pix = hold["images"].astype(np.float32) / 127.5 - 1.0
    eval_lab = hold["labels"]

    def eval_batches():
        for lo in range(0, len(eval_lab), 64):
            yield {
                "pixel_values": eval_pix[lo : lo + 64],
                "labels": eval_lab[lo : lo + 64],
            }

    res = evaluate(
        lambda p, pix: model.apply({"params": p}, pix),
        trainer.params, eval_batches(), topk=(1,),
    )
    print(f"held-out top-1: {res['top1_acc']:.4f} (n={res['n']:.0f}, "
          f"chance {1.0/num_classes:.3f})")

    if final_loss != final_loss:  # NaN: never clobber a good checkpoint
        print("final loss is NaN — NOT saving a checkpoint")
        sys.exit(1)
    save_checkpoint(os.path.join(run_dir, "ckpt"), trainer.step,
                    {"params": trainer.params})
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(
            {
                "preset": args.preset, "label_mode": args.label_mode,
                "steps": trainer.step,
                "batch": args.batch, "final_loss": float(final_loss),
                "holdout_top1": float(res["top1_acc"]),
                "train_sec": dt, "params_m": n_params / 1e6,
            },
            f, indent=1,
        )
    print(f"checkpoint + summary under {run_dir}")


if __name__ == "__main__":
    main()
