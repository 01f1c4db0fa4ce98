"""Saccadic batched-runner benchmark (BASELINE.json "saccadic + multistate
multi-glimpse inference" config): 16 images x 10 lockstep glimpses,
ViT-B-width (768) patterns, beam 64, covariance rank 64.

Races the matcher decompositions back-to-back in one process (the only
trustworthy chip comparison, CLAUDE.md): "eigh" (r2 Gram-eigendecomposition,
mirrors the reference's SVD route) vs "chol" (Cholesky-Woodbury direct
solve, r3).  Usage:

    python benchmarks/bench_saccadic.py [solvers...]   # default: eigh chol

Timing: one jitted lax.scan per run (10 steps), queued protocol from
_timing.bench_queued; the i-dependent input varies the pixel batch.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from _timing import bench_queued  # noqa: E402  (sets compilation cache)

from msvit_tpu.models.saccadic import (  # noqa: E402
    SaccadicViTConfig,
    SaccadicViTMultiStatePattern,
)
from msvit_tpu.models.saccadic.batched import batched_saccade_run  # noqa: E402
from msvit_tpu.models.saccadic.embeddings import (  # noqa: E402
    SaccadicViTEmbeddings,
)

B = 16
STEPS = 10


def main():
    solvers = sys.argv[1:] or ["eigh", "chol"]
    base = dict(
        hidden_size=768,
        num_hidden_layers=12,
        num_attention_heads=12,
        num_patterns=((2, 512),),
        covariance_dim=64,
        beam_size=64,
        image_size=448,
        patch_size=128,
        patch_config="translation",
        pe_bias=True,
    )
    rng = jax.random.PRNGKey(0)
    pix0 = jax.random.normal(rng, (B, 448, 448, 3), jnp.float32)

    # params are solver-independent; init once and reuse across runs
    cfg0 = SaccadicViTConfig(**base, matcher_solver=solvers[0])
    embeddings = SaccadicViTEmbeddings(cfg0)
    pattern = SaccadicViTMultiStatePattern(cfg0)
    k_e, k_p = jax.random.split(rng)
    emb_vars = embeddings.init(k_e, pix0, jnp.zeros((B, cfg0.dof)))
    h0 = jnp.zeros((B, 1, cfg0.hidden_size))
    c0 = jnp.zeros((B, STEPS, cfg0.hidden_size))
    pat_vars = pattern.init(k_p, h0, c0, 1)
    variables = {"embeddings": emb_vars, "pattern": pat_vars}
    variables = jax.device_put(variables)

    traces = {}
    for solver in solvers:
        cfg = SaccadicViTConfig(**base, matcher_solver=solver)
        traces[solver] = jax.jit(
            lambda v, px, c=cfg: batched_saccade_run(c, v, px, num_steps=STEPS)
        )(variables, pix0)

        def run(v, px):
            trace = batched_saccade_run(cfg, v, px, num_steps=STEPS)
            # full-tensor reduction sync (timing methodology)
            return (
                jnp.sum(trace["embeddings"].astype(jnp.float32))
                + jnp.sum(trace["predicted"].astype(jnp.float32))
                + jnp.sum(trace["num_saccades"])
            )

        jrun = jax.jit(run)

        def call(i):
            px = pix0 + (i * 1e-3)
            return jrun(variables, px)

        sec = bench_queued(call, iters=10, warmup=2)
        print(
            f"solver={solver}: {sec * 1e3:.1f} ms/run "
            f"({B} imgs x {STEPS} glimpses)"
        )

    if len(traces) > 1:
        ref_name, ref = next(iter(traces.items()))
        for name, tr in list(traces.items())[1:]:
            for key in ("embeddings", "predicted", "queries"):
                d = float(
                    jnp.max(
                        jnp.abs(
                            tr[key].astype(jnp.float32)
                            - ref[key].astype(jnp.float32)
                        )
                    )
                )
                print(f"max|{key}({name}) - {key}({ref_name})| = {d:.3e}")
            same = int(jnp.sum(tr["num_saccades"] == ref["num_saccades"]))
            print(f"num_saccades equal on {same}/{B} images")


if __name__ == "__main__":
    main()
