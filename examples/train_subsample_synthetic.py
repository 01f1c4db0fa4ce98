"""Subsample REINFORCE at the reference's config, with a measurable
policy — the learning-evidence run of VERDICT r3 item 1b.

Reference anchor: `sandbox/subsample_vit.py:52-126` — 6-layer trunk,
grid 4 → ×2, depth 1, bs32, AdamW(1e-3) on the subdivision policy ONLY,
loss = batch-standardized CE × episode log-prob, on streamed ImageNet
with a pretrained trunk.  Offline counterpart on the procedural corpus
(`data/synthetic.py`), whose region masks make the policy's behavior
*quantifiable*: a box is "object-relevant" if ≥`--obj-thresh` of its
pixels belong to a foreground object, and the metric is the precision /
recall of subdivision decisions against that ground truth.

Phases (the pretrained-trunk stance, reproduced offline):
  A. supervised warmup of trunk+head under the *sampled* (initially
     random) policy — the stand-in for the reference's pretrained
     Dinov2 trunk;
  B. REINFORCE on the policy params only (reference semantics,
     `reinforce_loss`), trunk/head frozen.

Evaluation: held-out accuracy of (learned policy) vs (never-subdivide)
vs (always-subdivide) controls — the controls are the same params with
the policy bias forced to ∓20 — plus the subdivision/object alignment
metrics over training, and a quadtree heat-map figure.

    python examples/train_subsample_synthetic.py                    # full
    python examples/train_subsample_synthetic.py --warmup 8 --steps 8  # smoke
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


def box_object_fraction(
    regions: np.ndarray, grid: int, target_only: bool = False
) -> np.ndarray:
    """[B, G*G] fraction of object pixels per root box.  Root boxes tile
    the image in row-major (y, x) order, matching the subsample model's
    initial grid.  With ``target_only`` only the label-defining target
    object counts (center label mode: the target is drawn last, so its
    region id is the per-image max) — the policy should subdivide where
    the *answer* is, not where any distractor is."""
    b, s, _ = regions.shape
    cell = s // grid
    r = regions[:, : cell * grid, : cell * grid]
    r = r.reshape(b, grid, cell, grid, cell)
    if target_only:
        tid = regions.reshape(b, -1).max(axis=1)
        occ = r == tid[:, None, None, None, None]
    else:
        occ = r > 0
    return occ.mean(axis=(2, 4)).reshape(b, grid * grid)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warmup", type=int, default=600, help="phase A steps")
    ap.add_argument("--steps", type=int, default=400, help="phase B steps")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--warmup-lr", type=float, default=3e-4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--corpus-size", type=int, default=2048)
    ap.add_argument("--eval-size", type=int, default=512)
    ap.add_argument("--obj-thresh", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="runs/synthetic")
    ap.add_argument(
        "--label-mode", default="largest", choices=["largest", "center", "texture", "ltexture"],
        help="'center' (r5) makes the CE reward meaningful: the label is "
        "the centered target object's class, so subdividing the boxes "
        "that contain it actually changes the reward")
    ap.add_argument("--max-objects", type=int, default=3)
    ap.add_argument(
        "--trunk", default="none", choices=["none", "s8d6"],
        help="'s8d6' bootstraps the trunk from the pretrain_synthetic "
        "s8d6 checkpoint (the reference's pretrained-trunk stance, "
        "sandbox/subsample_vit.py:52-66): phase A then trains the "
        "classifier head only and phase B the policy only.",
    )
    ap.add_argument("--ckpt", default=None)
    ap.add_argument(
        "--token-cost", type=float, default=0.0,
        help="λ: REINFORCE cost per-sample = CE + λ·(tokens/capacity). "
        "0 = the reference's pure-CE reward (sandbox/subsample_vit.py:"
        "83,112-113), under which always-subdivide is optimal by "
        "construction and the learned policy can only tie it.  λ>0 is "
        "the offline selectivity probe (r5, flagged deviation): the "
        "policy must now keep only subdivisions that pay for their "
        "tokens, so subdivision precision vs the target's boxes becomes "
        "measurable.")
    ap.add_argument(
        "--warm-full", action="store_true",
        help="phase A fine-tunes the WHOLE trunk (not head-only) under "
        "the sampled policy.  Needed offline (r5): the box glimpses are "
        "56px->patch resamples, a resolution shift the full-grid "
        "pretrain never saw — head-only warmup leaves CE at chance, so "
        "REINFORCE gets no reward gradient.  The reference sidesteps "
        "this with a hub classifier trained at matching resolution "
        "(sandbox/subsample_vit.py:52-66).")
    args = ap.parse_args()

    from msvit_tpu.data.synthetic import (
        label_classes,
        corpus_batches,
        ensure_corpus,
        generate_batch,
    )
    from msvit_tpu.models.subsample import (
        SubsampleViTConfig,
        SubsampleViTForImageClassification,
        reinforce_loss,
    )
    from msvit_tpu.train.loop import make_optimizer
    from msvit_tpu.utils.metrics import MetricsLogger

    mode_sfx = "" if args.label_mode == "largest" else f"_{args.label_mode}"
    if args.max_objects != 3:
        mode_sfx += f"_m{args.max_objects}"
    run_dir = os.path.join(args.out, f"subsample{mode_sfx}")
    os.makedirs(run_dir, exist_ok=True)
    data = ensure_corpus(args.out, args.corpus_size, size=224,
                         seed=args.seed, label_mode=args.label_mode,
                         max_objects=args.max_objects)

    # sandbox geometry: 6 layers, grid 4 -> x2, depth 1.  The patch size
    # follows the trunk (the reference used its pretrained trunk's 14):
    # 16 for from-scratch, 8 when bootstrapping from the s8d6 checkpoint.
    trunk_kw = dict(patch_size=16)
    if args.trunk == "s8d6":
        trunk_kw = dict(hidden_size=384, num_attention_heads=6, patch_size=8)
    cfg = SubsampleViTConfig(
        num_hidden_layers=6,
        image_size=224,
        initial_grid_size=4,
        multiplicative_grid_size=2,
        nesting_mode="open",
        max_depth=1,
        num_labels=len(label_classes(args.label_mode)),
        **trunk_kw,
    )
    model = SubsampleViTForImageClassification(cfg)
    rng = jax.random.PRNGKey(args.seed)
    grid = cfg.initial_grid_size
    n_roots = grid * grid

    it = corpus_batches(data, args.batch, seed=args.seed, include_regions=True)
    first = next(it)
    pix0 = jnp.asarray(first["pixel_values"])
    lab0 = jnp.asarray(first["labels"])
    variables = jax.jit(model.init)(
        {"params": rng, "policy": rng}, pix0[:1], lab0[:1]
    )
    if args.trunk == "s8d6":
        from msvit_tpu.compat import transfer_base_to_subsample
        from msvit_tpu.models.base import BaseViTConfig
        from msvit_tpu.models.base.vit import ViTForImageClassification
        from msvit_tpu.train import restore_checkpoint

        ckpt = args.ckpt or os.path.join(
            args.out, f"pretrain_s8d6{mode_sfx}", "ckpt"
        )
        bgeom = dict(hidden_size=384, num_hidden_layers=6,
                     num_attention_heads=6, patch_size=8, image_size=224)
        bmodel = ViTForImageClassification(BaseViTConfig(**bgeom),
                                           num_labels=len(label_classes(args.label_mode)))
        bparams = jax.jit(bmodel.init)(
            {"params": rng}, jnp.zeros((1, 224, 224, 3))
        )["params"]
        bparams = restore_checkpoint(ckpt, {"params": bparams})["params"]
        variables = {
            **variables,
            "params": transfer_base_to_subsample(
                bparams["vit"], variables["params"], 6
            ),
        }
        print(f"bootstrapped trunk from {ckpt}")

    metrics = MetricsLogger(os.path.join(run_dir, "metrics.jsonl"))

    # ---- phase A: supervised warmup of trunk+head (policy params frozen,
    # decisions still sampled from the untrained=near-random policy) ----
    if args.trunk == "s8d6" and not args.warm_full:
        # trunk is pretrained: head-only warmup
        warm_trainable = lambda path: "classifier" in path  # noqa: E731
    else:
        warm_trainable = lambda path: "projection" not in path  # noqa: E731
    warm_opt = make_optimizer(args.warmup_lr, trainable=warm_trainable)
    warm_state = jax.jit(warm_opt.init)(variables)

    @jax.jit
    def warm_step(v, s, pix, labels, key):
        def loss_fn(v):
            out = model.apply(v, pix, labels, rngs={"policy": key})
            return jnp.mean(out["loss"]), out["loss"]

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(v)
        updates, s = warm_opt.update(grads, s, v)
        return optax.apply_updates(v, updates), s, loss

    t0 = time.perf_counter()
    batch = first
    for i in range(args.warmup):
        pix = jnp.asarray(batch["pixel_values"])
        labels = jnp.asarray(batch["labels"])
        variables, warm_state, loss = warm_step(
            variables, warm_state, pix, labels, jax.random.fold_in(rng, i)
        )
        if i % 50 == 0 or i == args.warmup - 1:
            metrics.log(i, phase="warmup", ce=float(loss))
            print(f"[warmup {i}] CE {float(loss):.4f}", flush=True)
        batch = next(it)
    print(f"phase A done in {time.perf_counter() - t0:.0f}s")

    # ---- phase B: REINFORCE on the policy only ----
    pol_opt = make_optimizer(
        args.lr, trainable=lambda path: "projection" in path
    )
    pol_state = jax.jit(pol_opt.init)(variables)

    @jax.jit
    def pol_step(v, s, pix, labels, key):
        def loss_fn(v):
            out = model.apply(v, pix, labels, rngs={"policy": key},
                              output_logs=True)
            cost = out["loss"]
            if args.token_cost > 0.0:
                tok_frac = out["last_valid_mask"].sum(-1) / float(
                    cfg.capacity
                )
                cost = cost + args.token_cost * tok_frac
            return reinforce_loss(cost, out["log_prob"]), out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(v)
        updates, s = pol_opt.update(grads, s, v)
        # root-level subdivision decisions: [B, cap] bool, roots first
        decisions = out["logs"]["subsample_masks"][0][:, :n_roots]
        return (optax.apply_updates(v, updates), s, loss,
                jnp.mean(out["loss"]), decisions)

    def align(decisions, regions):
        """precision/recall of subdivision vs object-relevant boxes."""
        frac = box_object_fraction(
            regions, grid, target_only=args.label_mode in ("center", "texture")
        )
        relevant = frac >= args.obj_thresh
        dec = np.asarray(decisions, bool)
        tp = (dec & relevant).sum()
        prec = tp / max(dec.sum(), 1)
        rec = tp / max(relevant.sum(), 1)
        return float(prec), float(rec), float(dec.mean()), float(relevant.mean())

    t0 = time.perf_counter()
    for i in range(args.steps):
        pix = jnp.asarray(batch["pixel_values"])
        labels = jnp.asarray(batch["labels"])
        variables, pol_state, loss, ce, decisions = pol_step(
            variables, pol_state, pix, labels, jax.random.fold_in(rng, 10**6 + i)
        )
        if i % 25 == 0 or i == args.steps - 1:
            prec, rec, subdiv_rate, base_rate = align(
                decisions, batch["regions"]
            )
            metrics.log(
                args.warmup + i, phase="reinforce", reinforce=float(loss),
                ce=float(ce), precision=prec, recall=rec,
                subdiv_rate=subdiv_rate, relevant_rate=base_rate,
            )
            print(
                f"[reinforce {i}] CE {float(ce):.4f}  subdiv {subdiv_rate:.2f}"
                f"  precision {prec:.3f} (base {base_rate:.3f})  recall {rec:.3f}",
                flush=True,
            )
        batch = next(it)
    print(f"phase B done in {time.perf_counter() - t0:.0f}s")
    metrics.close()

    # ---- evaluation: learned policy vs forced controls ----
    def forced(v, bias):
        proj = v["params"]["model"]["projection"]
        forced_proj = {**proj, "bias": jnp.full_like(proj["bias"], bias)}
        return {
            **v,
            "params": {
                **v["params"],
                "model": {**v["params"]["model"], "projection": forced_proj},
            },
        }

    hold = generate_batch(
        range(20_000_000, 20_000_000 + args.eval_size), size=224,
        label_mode=args.label_mode, max_objects=args.max_objects,
    )
    eval_pix = hold["images"].astype(np.float32) / 127.5 - 1.0
    eval_lab = hold["labels"]

    @jax.jit
    def logits_of(v, pix, key):
        out = model.apply(v, pix, rngs={"policy": key})
        return out["classifier_logits"], out["last_valid_mask"].sum(-1)

    def accuracy(v):
        correct = tokens = 0
        for lo in range(0, args.eval_size - args.batch + 1, args.batch):
            pix = jnp.asarray(eval_pix[lo : lo + args.batch])
            logits, n_tok = logits_of(v, pix, jax.random.PRNGKey(lo))
            correct += int(
                (np.argmax(np.asarray(logits), -1)
                 == eval_lab[lo : lo + args.batch]).sum()
            )
            tokens += float(np.asarray(n_tok).mean())
        n_batches = len(range(0, args.eval_size - args.batch + 1, args.batch))
        return correct / (n_batches * args.batch), tokens / n_batches

    acc_learned, tok_learned = accuracy(variables)
    acc_never, tok_never = accuracy(forced(variables, -20.0))
    acc_always, tok_always = accuracy(forced(variables, +20.0))
    print(f"\nheld-out top-1 (n={args.eval_size}, chance "
          f"{1.0/len(label_classes(args.label_mode)):.3f}):")
    print(f"  learned policy : {acc_learned:.4f}  ({tok_learned:.1f} tokens/img)")
    print(f"  never subdivide: {acc_never:.4f}  ({tok_never:.1f} tokens/img)")
    print(f"  always subdivide:{acc_always:.4f}  ({tok_always:.1f} tokens/img)")

    # quadtree heat-map figure on a few held-out images
    from msvit_tpu.models.subsample import build_quadtree
    from msvit_tpu.viz import visualize_subsample_output

    out = model.apply(
        variables, jnp.asarray(eval_pix[:4]),
        jnp.asarray(eval_lab[:4]), rngs={"policy": jax.random.PRNGKey(0)},
        output_logs=True, return_pixel_values=True,
    )
    visualize_subsample_output(
        out, build_quadtree(cfg), show=False,
        save_path=os.path.join(run_dir, "quadtree.png"),
    )
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(
            {
                "warmup": args.warmup, "steps": args.steps,
                "label_mode": args.label_mode,
                "acc_learned": acc_learned, "acc_never": acc_never,
                "acc_always": acc_always, "tokens_learned": tok_learned,
                "tokens_never": tok_never, "tokens_always": tok_always,
            },
            f, indent=1,
        )
    print(f"figure + metrics under {run_dir}")


if __name__ == "__main__":
    main()
