"""Multistate fine-tune step cost (r3): grouped packed backward e2e.

The multistate trunk's 816-token soft-masked layers (patch 8 @224 →
784 tokens + 2×16 cluster tokens) previously took the fused/flash
attention route in both directions; the head-grouped packed kernels
(forward + dp-scratch backward) now serve them.  This times one
value_and_grad fine-tune step (reference-style: TX/RX tokens +
classifier trainable; grads still flow through every trunk layer) for
attn_implementation in {auto(=packed-grouped), fused} back-to-back in
one process — the only comparison the chip-state variance allows.

Usage: python benchmarks/bench_multistate_train_r3.py [impl ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from _timing import bench_queued
from msvit_tpu.models.clustering import SpectralClusteringConfig
from msvit_tpu.models.multistate import (
    MultiStateViTConfig,
    MultiStateViTForImageClassification,
)
from msvit_tpu.train.loop import make_optimizer


def bench(attn="auto", batch=8, num_sample=512, iters=10):
    cfg = MultiStateViTConfig(
        patch_size=8,
        image_size=224,
        pregeneration_period=4,
        generation_period=2,
        attn_implementation=attn,
        clustering=SpectralClusteringConfig(
            ncut_dim=8,
            num_sample=num_sample,
            max_clusters=16,
            eigenvalue_threshold=0.1,
            ncut_dist="rbf",
            shared_anchors=True,
        ),
    )
    model = MultiStateViTForImageClassification(cfg, num_labels=10)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (batch, 224, 224, 3), jnp.float32)
    labels = jax.random.randint(rng, (batch,), 0, 10)
    params = jax.jit(model.init)(
        {"params": rng, "clustering": rng}, pix[:1], labels[:1]
    )
    opt = make_optimizer(
        1e-3,
        trainable=lambda path: any(
            n in ("transmitter_token", "receiver_token", "classifier")
            for n in path
        ),
    )
    opt_state = opt.init(params["params"])

    @jax.jit
    def step(params, opt_state, pix, labels, key):
        def loss_fn(p):
            out = model.apply(
                {**params, "params": p}, pix, labels,
                rng=key, deterministic=False,
            )
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params["params"])
        updates, opt_state = opt.update(grads, opt_state, params["params"])
        p = jax.tree.map(lambda a, u: a + u, params["params"], updates)
        return {**params, "params": p}, opt_state, loss

    keys = jax.random.split(jax.random.PRNGKey(1), iters + 4)
    state = {"p": params, "o": opt_state}

    def it(i):
        state["p"], state["o"], loss = step(
            state["p"], state["o"], pix + i * 1e-6, labels, keys[i]
        )
        return loss

    dt = bench_queued(it, iters=iters)
    print(
        f"attn={attn}: {dt*1e3:.1f} ms/step (bs{batch}, 816 tokens, "
        f"num_sample={num_sample}, TX/RX+head trainable)", flush=True
    )
    return dt


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    impls = sys.argv[1:] or ["auto", "fused"]
    for impl in impls:
        bench(attn=impl)
