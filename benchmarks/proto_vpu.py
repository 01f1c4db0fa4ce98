"""VPU transcendental throughput on the chip: exp/erf/tanh/softmax floors.

Differential harness: each op is timed as 8 in-graph reps with an
identical per-rep full-sum reduction; subtracting the identity-op time
isolates the op cost from the (surprisingly expensive) reduction.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

ITERS = 10
REPS = 8


def bench_op(name, op, x, elems, t_ident=None):
    def f(x, i):
        acc = jnp.float32(0)
        for j in range(REPS):
            y = op(x + (i + j) * 1e-6)
            acc = acc + jnp.sum(y.astype(jnp.float32))
        return acc

    fj = jax.jit(f)
    float(fj(x, 0.0))
    t0 = time.perf_counter()
    for i in range(ITERS):
        s = fj(x, float(i + 1))
    float(s)
    dt = (time.perf_counter() - t0) / ITERS / REPS * 1000  # ms per rep
    net = dt - (t_ident or 0.0)
    rate = elems / max(net, 1e-9) / 1e6
    extra = f"  net {net:6.2f} ms ({rate:5.0f} G/s)" if t_ident else ""
    print(f"{name:44s} {dt:7.2f} ms/rep{extra}")
    return dt


def main():
    rng = jax.random.PRNGKey(0)
    M = 100864
    x32 = jax.random.normal(rng, (M, 768), jnp.float32)
    x16 = x32.astype(jnp.bfloat16)
    n = x32.size

    print(f"elementwise over [{M},768] = {n/1e6:.0f}M elems, per-rep times")
    t32 = bench_op("identity f32", lambda v: v, x32, n)
    t16 = bench_op("identity bf16", lambda v: v, x16, n)
    bench_op("exp f32", jnp.exp, x32, n, t32)
    bench_op("exp bf16", jnp.exp, x16, n, t16)
    bench_op("tanh f32", jnp.tanh, x32, n, t32)
    bench_op("erf f32", jax.lax.erf, x32, n, t32)
    bench_op("gelu exact bf16", lambda v: jax.nn.gelu(v, approximate=False), x16, n, t16)
    bench_op("gelu tanh bf16", lambda v: jax.nn.gelu(v, approximate=True), x16, n, t16)
    bench_op("quant(int8) bf16", lambda v: jnp.clip(jnp.round(v.astype(jnp.float32) * 50.0), -127, 127).astype(jnp.int8), x16, n, t16)

    s16 = (jax.random.normal(rng, (512, 12, 197, 197), jnp.float32)).astype(jnp.bfloat16)
    ns = s16.size
    print(f"softmax over [512,12,197,197] = {ns/1e6:.0f}M elems")
    ts = bench_op("identity (scores bf16)", lambda v: v, s16, ns)
    bench_op("softmax f32-math", lambda v: jax.nn.softmax(v.astype(jnp.float32), -1).astype(jnp.bfloat16), s16, ns, ts)
    bench_op("softmax bf16-math", lambda v: jax.nn.softmax(v, -1), s16, ns, ts)

    g = jax.random.normal(rng, (M, 3072), jnp.bfloat16)
    ng = g.size
    print(f"gelu @fc1 shape [{M},3072] = {ng/1e6:.0f}M elems (x12 in model)")
    tg = bench_op("identity", lambda v: v, g, ng)
    bench_op("gelu exact", lambda v: jax.nn.gelu(v, approximate=False), g, ng, tg)
    bench_op("gelu tanh", lambda v: jax.nn.gelu(v, approximate=True), g, ng, tg)
    bench_op("gelu exact + quant", lambda v: jnp.clip(jnp.round(jax.nn.gelu(v, approximate=False).astype(jnp.float32) * 50.0), -127, 127).astype(jnp.int8), g, ng, tg)
    bench_op("relu + quant", lambda v: jnp.clip(jnp.round(jax.nn.relu(v).astype(jnp.float32) * 50.0), -127, 127).astype(jnp.int8), g, ng, tg)


if __name__ == "__main__":
    main()
