"""Multistate at 224px/784 tokens on trained features, with quantitative
cluster-vs-region metrics — the learning-evidence run of VERDICT r3 item 1c.

Reference anchor: `sandbox/test.py:42-83` — MultiStateViTEncoderModel
bootstrapped from `facebook/dino-vitb8` (ViT-B/8 @224, 784 patch
tokens), spectral clustering (ncut_dim 8, rbf, eig threshold 0.1), run
over real images and inspected visually.  Offline counterpart: the
trunk comes from `examples/pretrain_synthetic.py --preset b8` (same
geometry, trained on the procedural corpus), and the inspection is
*quantitative* — the corpus provides exact region masks, so cluster
assignments are scored with ARI/NMI against patch-majority region
labels, vs a random-partition control and an untrained-trunk control.

    python examples/train_multistate_synthetic.py                 # full
    python examples/train_multistate_synthetic.py --eval-size 16  # quick

Outputs under --out/multistate: clusters.png (image / regions / cluster
map triptychs), summary.json (ARI/NMI for trained / untrained / random),
optional head fine-tune accuracy (--head-steps > 0).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np


def patch_region_labels(regions: np.ndarray, patch: int) -> np.ndarray:
    """[B, S, S] pixel region ids -> [B, (S//p)^2] patch-majority labels."""
    b, s, _ = regions.shape
    g = s // patch
    r = regions[:, : g * patch, : g * patch].reshape(b, g, patch, g, patch)
    r = r.transpose(0, 1, 3, 2, 4).reshape(b, g * g, patch * patch)
    out = np.zeros((b, g * g), np.int32)
    for i in range(b):  # small B; bincount per patch
        for j in range(g * g):
            out[i, j] = np.bincount(r[i, j]).argmax()
    return out


def cluster_scores(cluster_indices: np.ndarray, region_labels: np.ndarray):
    """Mean ARI/NMI over the batch."""
    from sklearn.metrics import (
        adjusted_rand_score,
        normalized_mutual_info_score,
    )

    aris, nmis = [], []
    for ci, rl in zip(cluster_indices, region_labels):
        aris.append(adjusted_rand_score(rl, ci))
        nmis.append(normalized_mutual_info_score(rl, ci))
    return float(np.mean(aris)), float(np.mean(nmis))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="pretrain_synthetic checkpoint dir (default "
                    "<out>/pretrain_<preset>/ckpt)")
    ap.add_argument("--preset", default="b8", choices=["b8", "s8", "s8d6", "small"])
    ap.add_argument("--eval-size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="runs/synthetic")
    ap.add_argument("--qk-norm", action="store_true",
                    help="trunk was pretrained with config.qk_norm "
                    "(the layer param trees must match for the transfer)")
    ap.add_argument(
        "--label-mode", default="largest", choices=["largest", "center", "texture", "ltexture"],
        help="match the trunk's pretrain corpus; 'center' (r5) scores "
        "clusters on the generalizing (non-memorizing) trunk")
    ap.add_argument("--max-objects", type=int, default=3)
    args = ap.parse_args()

    from msvit_tpu.compat.family_import import transfer_base_to_multistate
    from msvit_tpu.data.synthetic import generate_batch, label_classes
    from msvit_tpu.models.base import BaseViTConfig
    from msvit_tpu.models.base.vit import ViTForImageClassification
    from msvit_tpu.models.clustering import SpectralClusteringConfig
    from msvit_tpu.models.multistate import (
        MultiStateViTConfig,
        MultiStateViTEncoderModel,
    )
    from msvit_tpu.train import restore_checkpoint

    mode_sfx = "" if args.label_mode == "largest" else f"_{args.label_mode}"
    if args.max_objects != 3:
        mode_sfx += f"_m{args.max_objects}"
    run_dir = os.path.join(args.out, f"multistate{mode_sfx}")
    os.makedirs(run_dir, exist_ok=True)

    if args.preset in ("b8", "s8", "s8d6"):
        width = 768 if args.preset == "b8" else 384
        geom = dict(hidden_size=width,
                    num_hidden_layers=6 if args.preset == "s8d6" else 12,
                    num_attention_heads=width // 64, patch_size=8,
                    image_size=224)
        clus = dict(ncut_dim=8, num_sample=1024, max_clusters=16)
        pregen, gen = 4, 2
        if args.qk_norm:
            geom["qk_norm"] = True
    else:  # smoke geometry, matches pretrain_synthetic --preset small
        geom = dict(hidden_size=128, num_hidden_layers=2,
                    num_attention_heads=4, patch_size=16, image_size=64)
        clus = dict(ncut_dim=4, num_sample=16, max_clusters=4)
        pregen, gen = 1, 1
    if args.ckpt is None:
        args.ckpt = os.path.join(
            args.out, f"pretrain_{args.preset}{mode_sfx}", "ckpt"
        )
    size, patch = geom["image_size"], geom["patch_size"]

    # --- restore the synthetically-pretrained base trunk ---
    base_model = ViTForImageClassification(
        BaseViTConfig(**geom), num_labels=len(label_classes(args.label_mode))
    )
    rng = jax.random.PRNGKey(args.seed)
    base_params = jax.jit(base_model.init)(
        {"params": rng}, jnp.zeros((1, size, size, 3))
    )["params"]
    restored = restore_checkpoint(args.ckpt, {"params": base_params})
    base_params = restored["params"]
    print(f"restored trunk from {args.ckpt}")

    # --- the sandbox multistate config at 224/784 (test.py:47-57) ---
    ms_cfg = MultiStateViTConfig(
        **geom,
        pregeneration_period=pregen,
        generation_period=gen,
        clustering=SpectralClusteringConfig(
            **clus,
            eigenvalue_threshold=0.1,
            ncut_dist="rbf",
            eig_method="subspace",
            late_num_sample=min(256, clus["num_sample"]),
            # ^ reference-faithful per-parent draws, post-split budget
        ),
    )
    ms_model = MultiStateViTEncoderModel(ms_cfg)
    probe = jnp.zeros((1, size, size, 3))
    ms_init = jax.jit(ms_model.init)({"params": rng, "clustering": rng}, probe)
    ms_boot = {
        "params": transfer_base_to_multistate(
            base_params["vit"], ms_init["params"], geom["num_hidden_layers"]
        )
    }

    @jax.jit
    def clusters_of(params, pix, key):
        out = ms_model.apply(params, pix, rng=key)
        return out["last_cluster_indices"], out["last_hidden_state"]

    hold = generate_batch(
        range(30_000_000, 30_000_000 + args.eval_size), size=size,
        label_mode=args.label_mode, max_objects=args.max_objects,
    )
    pix = hold["images"].astype(np.float32) / 127.5 - 1.0
    region_patches = patch_region_labels(hold["regions"], patch)

    def run(params, tag):
        cis = []
        for lo in range(0, args.eval_size, args.batch):
            ci, _ = clusters_of(
                params, jnp.asarray(pix[lo : lo + args.batch]),
                jax.random.fold_in(jax.random.PRNGKey(7), lo),
            )
            cis.append(np.asarray(ci))
        ci = np.concatenate(cis)
        ari, nmi = cluster_scores(ci, region_patches)
        ncl = np.asarray([len(np.unique(c)) for c in ci]).mean()
        print(f"{tag:18s}: ARI {ari:+.4f}  NMI {nmi:.4f}  "
              f"(mean clusters {ncl:.1f})")
        return ci, ari, nmi, float(ncl)

    ci_tr, ari_tr, nmi_tr, ncl_tr = run(ms_boot, "trained trunk")
    _, ari_un, nmi_un, ncl_un = run(ms_init, "untrained trunk")

    # random-partition control with the trained run's cluster counts
    rng_np = np.random.default_rng(0)
    rand_ci = np.stack([
        rng_np.integers(0, max(len(np.unique(c)), 1), size=c.shape)
        for c in ci_tr
    ])
    ari_rd, nmi_rd = cluster_scores(rand_ci, region_patches)
    print(f"{'random partition':18s}: ARI {ari_rd:+.4f}  NMI {nmi_rd:.4f}")

    # --- triptych figure: image / ground-truth regions / clusters ---
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    g = size // patch
    n_show = min(4, args.eval_size)
    fig, axes = plt.subplots(n_show, 3, figsize=(9, 3 * n_show))
    for i in range(n_show):
        axes[i, 0].imshow(hold["images"][i])
        axes[i, 0].set_title("image" if i == 0 else None)
        axes[i, 1].imshow(region_patches[i].reshape(g, g), cmap="tab20")
        axes[i, 1].set_title("regions (patch)" if i == 0 else None)
        axes[i, 2].imshow(ci_tr[i].reshape(g, g), cmap="tab20")
        axes[i, 2].set_title("clusters" if i == 0 else None)
        for ax in axes[i]:
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(os.path.join(run_dir, "clusters.png"), dpi=110)
    plt.close(fig)

    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(
            {
                "eval_size": args.eval_size,
                "label_mode": args.label_mode,
                "trained": {"ari": ari_tr, "nmi": nmi_tr, "clusters": ncl_tr},
                "untrained": {"ari": ari_un, "nmi": nmi_un,
                              "clusters": ncl_un},
                "random": {"ari": ari_rd, "nmi": nmi_rd},
            },
            f, indent=1,
        )
    print(f"figure + summary under {run_dir}")


if __name__ == "__main__":
    main()
