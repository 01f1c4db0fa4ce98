"""Multistate inference — the `sandbox/test.py` workflow (reference
`sandbox/test.py:42-83`): a dino-vitb8-scale trunk (patch 8 @224 → 784
tokens), spectral clustering (ncut_dim 8, rbf, eigenvalue threshold 0.1),
TX/RX pooling.

By default runs on synthetic images (no network).  Pass --dataset to pull
real images via the HF hub and --pretrained to import dino-vitb8 weights
(both require network/cache access).

    python examples/multistate_inference.py [--batch 4] [--dataset ID]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dataset", default=None, help="HF dataset id (optional)")
    ap.add_argument(
        "--pretrained",
        default=None,
        help="checkpoint path, hub-layout dir, or HF hub id (hub needs network)",
    )
    ap.add_argument("--num-sample", type=int, default=512)
    args = ap.parse_args()

    from msvit_tpu.models.clustering import SpectralClusteringConfig
    from msvit_tpu.models.multistate import (
        MultiStateViTConfig,
        MultiStateViTEncoderModel,
    )

    cfg = MultiStateViTConfig(
        patch_size=8,
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
    model = MultiStateViTEncoderModel(cfg)
    rng = jax.random.PRNGKey(1212)  # the reference's seed

    if args.dataset:
        from msvit_tpu.data import load_image_batches

        batch = next(load_image_batches(args.dataset, batch_size=args.batch))
        pix = jnp.asarray(batch["pixel_values"])
    else:
        pix = jax.random.normal(rng, (args.batch, 224, 224, 3))

    variables = jax.jit(model.init)(
        {"params": rng, "clustering": rng}, pix[:1]
    )
    if args.pretrained:
        # path / hub-layout dir / hub id (hub only if network resolves)
        from msvit_tpu.compat import import_into_multistate, load_state_dict_from

        sd = load_state_dict_from(args.pretrained)
        variables = {
            "params": import_into_multistate(sd, cfg, variables["params"])
        }

    out = jax.jit(
        lambda v, x, k: model.apply(
            v, x, rngs={"clustering": k}, interpolate_pos_encoding=True
        )
    )(variables, pix, jax.random.PRNGKey(0))

    print("num_clusters:", int(out["num_clusters"]))
    print("cluster_tokens (TX):", out["cluster_tokens"].shape)
    print(
        "receiver_to_transmitter_attentions:",
        out["receiver_to_transmitter_attentions"].shape,
    )


if __name__ == "__main__":
    main()
