"""ViT-B/16 bf16 TRAINING-step throughput on one chip (full-param AdamW
fine-tune, CE over 1000 classes — the standard supervised recipe the
reference never measures; its only training runs are the tiny sandbox
loops `sandbox/predictive.py:96-137` / `subsample_vit.py:82-126`).

Reports img/s for the full fwd+bwd+update step at bs256, with and
without per-block remat (`BaseViTConfig.remat`).  The Pallas attention
kernels' dedicated backward (ops/flash_attention.py) means training
never materializes [B,H,N,N] probs in HBM on the kernel path.

Timing: queued-async, one scalar sync (benchmarks/_timing.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import optax

from _timing import bench_queued
from msvit_tpu.models.base import BaseViTConfig
from msvit_tpu.models.base.vit import ViTForImageClassification
from msvit_tpu.train.loop import make_optimizer, train_step_fn


def bench(batch_size: int = 256, remat: bool = False, iters: int = 10,
          attn: str = "auto"):
    cfg = BaseViTConfig(remat=remat, attn_implementation=attn)
    model = ViTForImageClassification(cfg, num_labels=1000)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(
        rng, (batch_size, 224, 224, 3), jnp.float32
    )
    labels = jax.random.randint(rng, (batch_size,), 0, 1000)
    params = jax.jit(model.init)({"params": rng}, pix[:1])

    optimizer = make_optimizer(learning_rate=1e-4)
    opt_state = jax.jit(optimizer.init)(params)

    def loss_fn(p, batch, key):
        logits = model.apply(p, batch["pixel_values"], deterministic=True)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["labels"]
        ).mean()
        return loss, {}

    # donation would free the params between queued iterations; keep them
    # (donate=False) so every queued step reuses the same buffers
    step = train_step_fn(loss_fn, optimizer, donate=False)

    def f(i):
        _, _, loss, _ = step(
            params,
            opt_state,
            {"pixel_values": pix + i * 1e-6, "labels": labels},
            jax.random.PRNGKey(0),
        )
        return loss

    dt = bench_queued(f, iters=iters)
    print(
        f"bs{batch_size} remat={int(remat)} attn={attn:5s}: "
        f"{dt * 1e3:7.1f} ms/step ({batch_size / dt:6.0f} img/s)"
    )
    return dt


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench(remat=False)
    bench(remat=False, attn="xla")
    bench(remat=True)
    # bs512 without remat needs 16.34G of 15.75G HBM (OOM by 604 MB);
    # remat trades ~15% step time for the headroom
    bench(batch_size=512, remat=True)
    bench(batch_size=1024, remat=True)
