"""Export → reload → serve: the deployment workflow.

Exports the jitted ViT forward to a jax.export artifact on disk, reloads
it (no flax / model-zoo import needed at load time), and drives it behind
the micro-batching server.  No reference counterpart (it has no
deployment story); see msvit_tpu/export.py and msvit_tpu/serve.py.

    python examples/export_serving.py [--requests 64]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import tempfile

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=192)
    ap.add_argument("--layers", type=int, default=4)
    args = ap.parse_args()

    from msvit_tpu.export import export_forward, load_forward
    from msvit_tpu.models.base import BaseViTConfig
    from msvit_tpu.models.base.vit import ViTModel
    from msvit_tpu.serve import BatchingServer

    cfg = BaseViTConfig(
        hidden_size=args.hidden,
        num_hidden_layers=args.layers,
        num_attention_heads=3,
        image_size=224,
        patch_size=16,
    )
    model = ViTModel(cfg)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (8, 224, 224, 3), jnp.float32)
    params = jax.jit(model.init)({"params": rng}, pix[:1])

    def fwd(p, x):
        return model.apply(p, x)["last_hidden_state"][:, 0]  # CLS embedding

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "vit.msvx")
        # polymorphic batch: one artifact serves every bucket size
        art = export_forward(fwd, (params, pix), polymorphic_batch=True)
        with open(path, "wb") as f:
            f.write(art)
        print(f"exported artifact: {len(art)/1e6:.2f} MB -> {path}")

        g = load_forward(open(path, "rb").read())
        want = np.asarray(fwd(params, pix), np.float32)
        got = np.asarray(g(params, pix), np.float32)
        # the polymorphic artifact runs the XLA attention path while the
        # live model may dispatch to the shape-specialized Pallas kernel,
        # so compare numerically, not bitwise
        diff = np.max(np.abs(want - got)) / max(np.max(np.abs(want)), 1e-9)
        print(f"reloaded artifact vs live model: max rel diff {diff:.2e}")

        server = BatchingServer(
            lambda x: g(params, jnp.asarray(x)),
            example=np.zeros((224, 224, 3), np.float32),
            max_batch=8,
        )
        with server:
            server.warmup()
            futs = [
                server.submit(
                    np.random.default_rng(i)
                    .standard_normal((224, 224, 3))
                    .astype(np.float32)
                )
                for i in range(args.requests)
            ]
            outs = [f.result() for f in futs]
        stats = server.stats()
        print(
            f"served {len(outs)} requests, embedding dim "
            f"{outs[0].shape[-1]}; latency p50 {stats['p50_ms']:.1f} ms "
            f"p95 {stats['p95_ms']:.1f} ms"
        )


if __name__ == "__main__":
    main()
