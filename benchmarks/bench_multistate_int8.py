"""int8 vs bf16 multistate trunk, back-to-back on the chip.

Resolves the r3 deferral (RESULTS.md "Multistate cost composition"): the
trunk (12 masked 816-token layers) dominates the multistate forward once
shared-anchor clustering amortizes the eigensolves.  This races the
quantized trunk (calibrated static act scales + head-grouped masked int8
attention kernel) against the production bf16 model at the BASELINE bs8
config and at a serving-scale bs32.

Usage: python benchmarks/bench_multistate_int8.py [--clust=shared|lateN]
       [bs ...]  (default --clust=shared 8 32).  --clust=late256 uses the
       reference-faithful per-parent anchors with the post-split budget
       (module.py late_num_sample) instead of the shared pool.
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
    MultiStateViTEncoderModel,
    calibrate_multistate_act_scales,
    quantize_multistate_params,
    quantized_multistate_apply,
)


def make_cfg(clust: str = "shared"):
    if clust == "shared":
        extra = dict(shared_anchors=True, anchors_per_parent=256)
    elif clust.startswith("late"):
        extra = dict(late_num_sample=int(clust[len("late"):]))
    else:
        raise SystemExit(f"unknown --clust mode {clust!r}")
    return MultiStateViTConfig(
        patch_size=8,
        image_size=224,
        pregeneration_period=4,
        generation_period=2,
        clustering=SpectralClusteringConfig(
            ncut_dim=8,
            num_sample=1024,
            max_clusters=16,
            eigenvalue_threshold=0.1,
            ncut_dist="rbf",
            eig_method="subspace",
            **extra,
        ),
    )


def bench(bs: int, iters: int = 20, clust: str = "shared"):
    cfg = make_cfg(clust)
    model = MultiStateViTEncoderModel(cfg)
    rng = jax.random.PRNGKey(1212)
    pix = jax.random.normal(rng, (bs, 224, 224, 3), jnp.float32)
    params = jax.jit(model.init)({"params": rng, "clustering": rng}, pix[:1])

    qp = quantize_multistate_params(params["params"])
    scales = calibrate_multistate_act_scales(
        qp, cfg, pix[: min(bs, 8)], jax.random.PRNGKey(0)
    )
    scales = jax.device_get(scales)  # freeze as concrete values

    @jax.jit
    def fwd_bf16(p, x, i, key):
        out = model.apply(p, x + i * 1e-6, rng=key)
        return jnp.sum(out["last_hidden_state"].astype(jnp.float32))

    @jax.jit
    def fwd_int8(qp_, x, i, key):
        out = quantized_multistate_apply(
            qp_, cfg, x + i * 1e-6, key, act_scales=scales
        )
        return jnp.sum(out["last_hidden_state"].astype(jnp.float32))

    @jax.jit
    def fwd_int8_attn(qp_, x, i, key):
        out = quantized_multistate_apply(
            qp_, cfg, x + i * 1e-6, key, act_scales=scales,
            attn_mode="int8",
        )
        return jnp.sum(out["last_hidden_state"].astype(jnp.float32))

    @jax.jit
    def fwd_int8_banded(qp_, x, i, key):
        out = quantized_multistate_apply(
            qp_, cfg, x + i * 1e-6, key, act_scales=scales,
            attn_mode="banded",
        )
        return jnp.sum(out["last_hidden_state"].astype(jnp.float32))

    keys = jax.random.split(jax.random.PRNGKey(1), iters + 4)
    # alternate twice: the chip's clock state drifts over the first
    # minutes of a process, so a single A/B order can fake a win
    for name, fn, arg in (
        ("bf16", fwd_bf16, params),
        ("int8", fwd_int8, qp),
        ("int8-banded", fwd_int8_banded, qp),
        ("bf16-again", fwd_bf16, params),
        ("int8-again", fwd_int8, qp),
        ("int8-banded2", fwd_int8_banded, qp),
    ):
        dt = bench_queued(lambda i: fn(arg, pix, float(i + 1), keys[i]),
                          iters=iters)
        print(
            f"bs={bs:3d} {name:10s}: {dt * 1e3:7.2f} ms/batch "
            f"({bs / dt:7.0f} img/s)",
            flush=True,
        )


if __name__ == "__main__":
    print("devices:", jax.devices())
    argv = sys.argv[1:]
    clust = "shared"
    if argv and argv[0].startswith("--clust="):
        clust = argv[0][len("--clust="):]
        argv = argv[1:]
    print("clustering:", clust)
    for bs in [int(a) for a in (argv or ["8", "32"])]:
        bench(bs, clust=clust)
