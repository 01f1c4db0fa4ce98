"""Head-grouped packed backward (r3): chip correctness + timing.

Target regime: multistate's 816-token soft-masked trunk layers
(B=8, H=12, dh=64, additive [B,1,N,N] mask) — previously served by the
flash dQ/dKV kernels (6 padded [B,H,N,64] HBM round-trips at dh=64,
2x tile expansion).  The grouped kernel reads qkv in its packed layout
and routes dp through a VMEM scratch so only one head's [N,N] panels
are live (grid (B, H/2)).

Usage: python benchmarks/bench_grouped_bwd_r3.py [N ...]   (default 816 384)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import bench_queued
import msvit_tpu.ops.packed_attention as pa

D, H = 768, 12


def run(n, b=8, dtype=jnp.bfloat16):
    rng = jax.random.PRNGKey(0)
    qkv = (jax.random.normal(rng, (b, n, 3 * D), jnp.float32)).astype(dtype)
    mask = (
        jax.random.bernoulli(jax.random.PRNGKey(1), 0.5, (b, 1, n, n))
        * -100.0
    ).astype(jnp.float32)

    def loss(x, mask, i):
        o = pa.packed_attention(x + i * 1e-6, H, mask=mask)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    results = {}
    for impl in ("grouped", "flash"):
        pa._BWD_IMPL = impl
        # fresh jit per impl: _BWD_IMPL is read at trace time, so a shared
        # jitted callable would silently reuse the first impl's trace
        grad = jax.jit(jax.grad(loss))
        try:
            g = grad(qkv, mask, -1.0)
            g.block_until_ready()
            results[impl] = np.asarray(g, dtype=np.float32)
            dt = bench_queued(
                lambda i: jnp.sum(grad(qkv, mask, jnp.float32(i))
                                  .astype(jnp.float32) ** 2),
                iters=10,
            )
            print(f"N={n} impl={impl}: {dt*1e3:.2f} ms fwd+bwd "
                  f"(b={b}, masked)", flush=True)
        except Exception as e:
            print(f"N={n} impl={impl}: FAILED — "
                  f"{str(e).splitlines()[0][:200]}", flush=True)
        finally:
            pa._BWD_IMPL = "auto"
    if "grouped" in results and "flash" in results:
        a, c = results["grouped"], results["flash"]
        cos = float((a * c).sum() / (np.linalg.norm(a) * np.linalg.norm(c)))
        print(f"N={n} dqkv cosine grouped vs flash: {cos:.7f}", flush=True)

    # what does auto dispatch pick?
    eb = jnp.dtype(dtype).itemsize
    print(
        f"N={n} auto gates: kernel={pa.packed_bwd_vmem_ok(n, D, H, eb, True)}"
        f" grouped={pa.grouped_bwd_vmem_ok(n, D, H, eb, True)}", flush=True
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    ns = [int(a) for a in sys.argv[1:]] or [816, 384]
    for n in ns:
        run(n)
