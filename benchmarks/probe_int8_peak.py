"""Is the 394 TOPS int8 nameplate reachable at all? (r3, VERDICT item 1)

The serving-path int8 GEMMs measure ~227 TOPS effective *including* the
dequant/requant epilogues — labeled "58% of peak" in r2.  Before chasing
a Mosaic mega-kernel, establish the chip's actually-achievable int8 MXU
ceiling: pure int8xint8->int32 matmuls, no epilogue, shapes swept from
ViT sizes to MXU-saturating squares, queued timing.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from _timing import bench_queued


def probe(m, k, n, chain=8, out_int8=False, tag=""):
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
    ws = [
        jax.random.randint(jax.random.PRNGKey(i + 1), (k, n), -127, 127,
                           jnp.int8)
        for i in range(chain)
    ]
    if k != n:
        chain = 1
        ws = ws[:1]

    @jax.jit
    def f(i, x, ws):
        # i-dependent input defeats memoization; int32 accum
        h = (x + (i.astype(jnp.int8))).astype(jnp.int8)
        acc = jnp.zeros((), jnp.float32)
        for w in ws:
            y = jax.lax.dot_general(
                h, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            if out_int8:
                h = (y >> 8).astype(jnp.int8)  # integer rescale, no f32
            else:
                acc = acc + jnp.sum(y).astype(jnp.float32)
                continue
        if out_int8:
            acc = jnp.sum(h).astype(jnp.float32)
        return acc

    xi = jnp.asarray(0, jnp.int32)
    dt = bench_queued(
        lambda i: f(jnp.asarray(int(i) % 3, jnp.int32), x, ws), iters=8
    )
    tops = 2 * m * k * n * chain / dt / 1e12
    print(f"{tag or f'{m}x{k}x{n}'} chain={chain} int8out={int(out_int8)}: "
          f"{dt*1e3:7.2f} ms  {tops:6.1f} TOPS", flush=True)
    return tops


def probe2(m, k, n, chain=8, epilogue="sum", tag=""):
    """Epilogue variants on arbitrary shapes: 'sum' (f32 total), 'shift'
    (int8 out via >>8), 'scale' (f32 dequant -> bf16, the serving path's
    epilogue), 'requant' (f32 dequant + f32->int8 requant, fc1->fc2)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
    ws = [
        jax.random.randint(jax.random.PRNGKey(i + 1), (k, n), -127, 127,
                           jnp.int8)
        for i in range(chain if k == n else 1)
    ]
    chain = len(ws)

    @jax.jit
    def f(i, x, ws):
        h = (x + i.astype(jnp.int8)).astype(jnp.int8)
        acc = jnp.zeros((), jnp.float32)
        for w in ws:
            y = jax.lax.dot_general(
                h, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            if epilogue == "shift":
                h = (y >> 8).astype(jnp.int8)
            elif epilogue == "scale":
                yb = (y.astype(jnp.float32) * 1.7e-4).astype(jnp.bfloat16)
                acc += jnp.sum(yb.astype(jnp.float32))
            elif epilogue == "requant":
                yq = (y.astype(jnp.float32) * 1.2e-2).astype(jnp.int8)
                h = yq if k == n else h
                acc += jnp.sum(yq.astype(jnp.float32)) * 0
            else:
                acc += jnp.sum(y).astype(jnp.float32)
        if epilogue == "shift":
            acc = jnp.sum(h).astype(jnp.float32)
        return acc

    dt = bench_queued(
        lambda i: f(jnp.asarray(int(i) % 3, jnp.int32), x, ws), iters=8
    )
    tops = 2 * m * k * n * chain / dt / 1e12
    print(f"{tag or f'{m}x{k}x{n}'} chain={chain} ep={epilogue:7s}: "
          f"{dt*1e3:7.2f} ms  {tops:6.1f} TOPS", flush=True)
    return tops


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    import sys as _s
    if "shapes" not in _s.argv:
        # MXU-saturating squares, accumulate-sum epilogue only
        probe(8192, 8192, 8192, chain=8, tag="square8k")
        probe(4096, 4096, 4096, chain=8, tag="square4k")
        # int8-out chain (integer shift rescale: cheapest epilogue)
        probe(8192, 8192, 8192, chain=8, out_int8=True, tag="square8k")
        # ViT serving shapes (M = 512*197)
        probe(100864, 768, 3072, chain=1, tag="fc1")
        probe(100864, 3072, 768, chain=1, tag="fc2")
        probe(100864, 768, 768, chain=8, tag="chain768")
    if "shapes" in _s.argv:
        # shape vs epilogue separation (r3)
        probe2(8192, 8192, 8192, epilogue="scale", tag="square8k")
        probe2(8192, 8192, 8192, epilogue="requant", tag="square8k")
        probe2(100864, 768, 3072, epilogue="shift", tag="fc1")
        probe2(100864, 3072, 3072, chain=4, epilogue="shift", tag="wide3k")
        probe2(8192, 3072, 3072, chain=8, epilogue="shift", tag="m8k3k")
        probe2(100864, 768, 768, chain=8, epilogue="shift", tag="chain768")
        probe2(25216, 768, 3072, epilogue="shift", tag="fc1_bs128")
