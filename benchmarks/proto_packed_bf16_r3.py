"""Round-3 VPU pass-shaving sweep for the bf16 packed attention forward
(`ops/packed_attention.py::_kernel_masked`) at the headline shape
[512, 197, 2304] bf16, scale pre-folded into q (scale=1.0).

The kernel is bound by f32 elementwise passes over the [197,197] scores
(~0.9 ms/layer each — RESULTS.md r2/r3): max, exp(+sub), sum, cast-bf16.
Variants remove whole passes:

* nomax  — softmax is shift-invariant; the max subtraction exists only
  to avoid overflow.  `exp(clamp(s, -80, 80))` cannot overflow the f32
  row sum (197*e^80 = 1.1e37 < f32 max) and keeps exact semantics for
  every realistic score (post-LN |s| << 80); fully-masked rows degrade
  to mean(v), exactly like XLA softmax of an all -1e9 row.  Removes the
  max pass AND the subtract from the exp pass.
* bf16exp — exp writes bf16 directly (pb = exp(.).astype(bf16)); the
  f32 row sum is then recovered on the MXU via a ones-column appended
  to v (dh 64 -> 65 lanes, dot cost is noise).  Removes the separate
  f32->bf16 cast pass and the VPU sum pass.
* nomax+bf16exp — single VPU pass over the scores: read MXU f32 s,
  write bf16 exp(clamp(s)).
* exp2 — like nomax+bf16exp but exp2 (q additionally pre-scaled by
  log2(e) at trace time): measures whether exp's internal *log2e
  multiply is visible.

Timing: queued-async, one scalar sync (benchmarks/_timing.py).
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _timing import bench_queued

B, N, D, H, DH = 512, 197, 768, 12, 64
REPS = 4
LOG2E = 1.4426950408889634


def kernel(qkv_ref, o_ref, *, nomax, bf16exp, exp2):
    tb = qkv_ref.shape[0]
    for e in range(tb):
        x = qkv_ref[e]
        outs = []
        for h in range(H):
            q = x[:, h * DH : (h + 1) * DH]
            k = x[:, D + h * DH : D + (h + 1) * DH]
            v = x[:, 2 * D + h * DH : 2 * D + (h + 1) * DH]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            expf = jnp.exp2 if exp2 else jnp.exp
            if nomax:
                z = jnp.clip(s, -80.0, 80.0)
            else:
                z = s - jnp.max(s, axis=-1, keepdims=True)
            if bf16exp == "vpusum":
                pb = expf(z).astype(jnp.bfloat16)
                l = jnp.sum(pb.astype(jnp.float32), axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    pb, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            elif bf16exp:
                pb = expf(z).astype(jnp.bfloat16)
                ones = jnp.ones((N, 1), jnp.bfloat16)
                v1 = jnp.concatenate([v, ones], axis=1)  # [N, DH+1]
                o1 = jax.lax.dot_general(
                    pb, v1, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o, l = o1[:, :DH], o1[:, DH : DH + 1]
            else:
                p = expf(z)
                l = jnp.sum(p, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            l_safe = jnp.where(l == 0.0, 1.0, l)
            outs.append((o / l_safe).astype(o_ref.dtype))
        o_ref[e] = jnp.concatenate(outs, axis=1)


@functools.partial(jax.jit, static_argnames=("nomax", "bf16exp", "exp2"))
def run(qkv, nomax=False, bf16exp=False, exp2=False):
    if exp2:  # fold log2(e) into q, as the model would at trace time
        qs = jnp.concatenate(
            [qkv[..., :D] * LOG2E, qkv[..., D:]], axis=-1
        ).astype(qkv.dtype)
    else:
        qs = qkv
    return pl.pallas_call(
        functools.partial(kernel, nomax=nomax, bf16exp=bf16exp, exp2=exp2),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, 3 * D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, N, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * N * DH,
            bytes_accessed=qkv.size * 2 + B * N * D * 2,
            transcendentals=B * H * N * N,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(qs)


def main():
    key = jax.random.PRNGKey(0)
    # realistic post-LN-projection magnitudes, scale folded (|s| ~ 10s)
    qkv = (jax.random.normal(key, (B, N, 3 * D), jnp.float32) * 0.7).astype(
        jnp.bfloat16
    )
    base = jax.jit(
        lambda x: jnp.asarray(run(x), jnp.float32)
    )(qkv)

    def make_probe(kw):
        @jax.jit
        def probe(x, i):
            y = run(
                (x + i.astype(jnp.bfloat16) * 1e-3).astype(jnp.bfloat16), **kw
            )
            return jnp.sum(jnp.asarray(y, jnp.float32))

        return probe

    variants = [
        ("prod (max,f32exp,sum,cast)", dict()),
        ("nomax", dict(nomax=True)),
        ("bf16exp+mxusum", dict(bf16exp=True)),
        ("nomax+bf16exp", dict(nomax=True, bf16exp=True)),
        ("nomax+bf16exp+vpusum", dict(nomax=True, bf16exp="vpusum")),
    ]
    for tag, kw in variants:
        y = jax.jit(lambda x: jnp.asarray(run(x, **kw), jnp.float32))(qkv)
        err = float(jnp.max(jnp.abs(y - base)))
        f = make_probe(kw)
        dts = [
            bench_queued(lambda i: f(qkv, jnp.asarray(i, jnp.int32)), iters=8)
            for _ in range(REPS)
        ]
        dt = min(dts)
        print(
            f"{tag:28s}: {dt*1e3:6.2f} ms/layer  "
            f"max|d| vs prod {err:.3e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
