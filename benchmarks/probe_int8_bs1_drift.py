"""int8 bs=1 latency drift diagnostic (VERDICT r3 item 6).

Observed: int8 bs=1 device latency moved 3.9 -> 5.5-6.0 ms across
sessions while bf16 held a stable 4.18 ms (RESULTS.md p50 section).
Hypotheses: (a) chip/clock state differing between sessions (then the
int8/bf16 RATIO inside one process is stable, and drift tracks the
session); (b) something in the int8 program itself is variance-prone
(then the ratio wobbles within a process too).

Method: one process, R alternating rounds of [int8 bs1 x50 queued,
bf16 bs1 x50 queued], interleaved so chip-state drift hits both paths
equally; report per-round ms and the int8/bf16 ratio spread.  A tight
ratio spread with round-to-round common-mode movement = chip state;
a loose ratio spread = int8-path glue.

Usage: python benchmarks/probe_int8_bs1_drift.py [rounds]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import statistics
import time

import jax
import jax.numpy as jnp

from _timing import bench_queued  # noqa: F401  (sets compilation cache)
from msvit_tpu.models.base import BaseViTConfig, ViTModel
from msvit_tpu.models.base.quantized import (
    calibrate_act_scales,
    quantize_vit_params,
    quantized_vit_apply,
)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    block = 50
    print("devices:", jax.devices(), flush=True)

    cfg = BaseViTConfig()
    model = ViTModel(cfg)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (1, 224, 224, 3), jnp.float32)
    variables = jax.jit(model.init)({"params": rng}, pix)
    qparams = quantize_vit_params(variables["params"])
    calib = jax.random.normal(rng, (64, 224, 224, 3), jnp.float32)
    scales = jax.jit(lambda q, x: calibrate_act_scales(q, cfg, x))(
        qparams, calib
    )

    @jax.jit
    def f_int8(qp, sc, x, i):
        out = quantized_vit_apply(qp, cfg, x + i * 1e-6, act_scales=sc)
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def f_bf16(v, x, i):
        out = model.apply(v, x + i * 1e-6)["last_hidden_state"]
        return jnp.sum(out.astype(jnp.float32))

    float(f_int8(qparams, scales, pix, 0.0))
    float(f_bf16(variables, pix, 0.0))

    def run(fn, *args):
        t0 = time.perf_counter()
        for i in range(block):
            s = fn(*args, float(i + 1))
        float(s)
        return (time.perf_counter() - t0) / block

    ratios, i8s, bfs = [], [], []
    for r in range(rounds):
        a = run(f_int8, qparams, scales, pix)
        b = run(f_bf16, variables, pix)
        ratios.append(a / b)
        i8s.append(a * 1e3)
        bfs.append(b * 1e3)
        print(f"round {r}: int8 {a * 1e3:5.2f} ms  bf16 {b * 1e3:5.2f} ms  "
              f"ratio {a / b:.3f}", flush=True)

    def spread(xs):
        m = statistics.median(xs)
        return (max(xs) - min(xs)) / m if m else 0.0

    print(f"\nint8  median {statistics.median(i8s):5.2f} ms  "
          f"spread {spread(i8s):.3f}")
    print(f"bf16  median {statistics.median(bfs):5.2f} ms  "
          f"spread {spread(bfs):.3f}")
    print(f"ratio median {statistics.median(ratios):.3f}  "
          f"spread {spread(ratios):.3f}")
    print("\ninterpretation: ratio spread << per-path spread -> session/chip "
          "state (common mode); ratio spread comparable -> int8-path glue.")


if __name__ == "__main__":
    main()
